#!/usr/bin/env python3
"""Lockstep round breakdown (VERDICT r4 weak #4/#6): where does the
B=2 round go?  Phases per round, measured inside the leader:

  stage   wall from round start to all-arrived (slowest parse+pack)
  lead    leader host work: bucket-expand + np.stack + device_put
  disp    batched jit dispatch call (async return)
  total   round wall (release to release)

Device time per round is inferred from the aggregate wall minus host
time.  Usage: profile_lockstep.py [B] [frames]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    import jax
    import numpy as np
    from bench_common import realistic_bench_stream
    from broadway_tpu.parallel import streams as PS
    from broadway_tpu.core import recon_tpu as RT
    from broadway_tpu.core import packed as PK

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    NF = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    datas = [realistic_bench_stream(120, 68, n_frames=NF, seed=5000 + s)
             for s in range(B)]
    warm = [realistic_bench_stream(120, 68, n_frames=2, seed=5000 + s)
            for s in range(B)]

    # wrap the leader round with phase timestamps
    rounds = []
    orig_batch = RT.decode_pictures_packed_batch
    orig_put = jax.device_put
    phase = {}

    def spy_put(x, *a, **k):
        t0 = time.perf_counter()
        r = orig_put(x, *a, **k)
        phase.setdefault("put", 0.0)
        phase["put"] += time.perf_counter() - t0
        return r

    def spy_batch(*a, **k):
        t0 = time.perf_counter()
        r = orig_batch(*a, **k)
        phase["disp"] = time.perf_counter() - t0
        return r

    class SyncSpy(PS._LockstepSync):
        def __init__(self, n, timeout=300.0):
            super().__init__(n, timeout)
            self._t_round0 = time.perf_counter()

        def arrive_and_wait(self):
            lead = super().arrive_and_wait()
            if lead:
                phase.clear()
                phase["stage"] = time.perf_counter() - self._t_round0
                phase["t_lead0"] = time.perf_counter()
            return lead

        def release(self):
            t = time.perf_counter()
            phase["lead"] = t - phase.pop("t_lead0") \
                - phase.get("disp", 0.0)
            phase["total"] = t - self._t_round0
            rounds.append(dict(phase))
            self._t_round0 = t
            super().release()

    PS._LockstepSync = SyncSpy
    RT.decode_pictures_packed_batch = spy_batch
    jax.device_put = spy_put
    try:
        PS.decode_streams_lockstep(warm, fetch=False)   # warm compiles
        rounds.clear()
        t0 = time.perf_counter()
        outs = PS.decode_streams_lockstep(datas, fetch=False)
        wall = time.perf_counter() - t0
    finally:
        PS._LockstepSync = SyncSpy.__mro__[1]
        RT.decode_pictures_packed_batch = orig_batch
        jax.device_put = orig_put

    n = sum(len(o) for o in outs)
    print(f"B={B}: {n} frames in {wall:.2f}s = {n / wall:.2f} fps "
          f"aggregate")
    for i, r in enumerate(rounds):
        print(f"round {i}: stage {r.get('stage', 0) * 1e3:6.1f} ms  "
              f"lead {r.get('lead', 0) * 1e3:5.1f} ms "
              f"(put {r.get('put', 0) * 1e3:5.1f})  "
              f"disp {r.get('disp', 0) * 1e3:5.1f} ms  "
              f"total {r.get('total', 0) * 1e3:6.1f} ms")
    ss = [r for r in rounds[2:]]    # steady state (skip I-frame rounds)
    if ss:
        import statistics as st
        print(f"steady-state: stage "
              f"{st.median(r['stage'] for r in ss) * 1e3:.1f} ms, lead "
              f"{st.median(r['lead'] for r in ss) * 1e3:.1f} ms, disp "
              f"{st.median(r['disp'] for r in ss) * 1e3:.1f} ms, total "
              f"{st.median(r['total'] for r in ss) * 1e3:.1f} ms "
              f"({B} frames/round)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Benchmark: H.264 Baseline decode pixel pipeline, frames/sec/chip.

Measures the jitted TPU pixel backend (residual + MC + intra wavefront +
deblock — core/recon_tpu.py) in steady state on the local accelerator:
single-stream latency and an 8-stream batch (vmap DP), at 1080p
(120x68 MBs) by default.

The reference publishes no numbers (BASELINE.md); the clip recipe is
29.97 fps video (reference README.markdown:35), so vs_baseline is
reported relative to 30 fps real-time single-stream playback.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

# persistent XLA/Mosaic compile cache (compiles are minutes at 1080p)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "build", "jaxcache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

W_MBS = int(os.environ.get("BENCH_W_MBS", "120"))
H_MBS = int(os.environ.get("BENCH_H_MBS", "68"))
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
REPS = int(os.environ.get("BENCH_REPS", "16"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_common import bench_stream, parse_pictures
    from broadway_tpu.core import recon_tpu as RT
    from broadway_tpu.ops.tpu import mc_pallas as K_mcp
    from broadway_tpu.parallel.streams import decode_pictures_batch

    mc = RT.default_mc_backend()
    data = bench_stream(W_MBS, H_MBS, n_frames=3)
    pics = parse_pictures(data, max_pics=2)
    arrs, w, h, cqo, n_slots = pics[-1]  # a P picture
    arrs = {k: jnp.asarray(v) for k, v in arrs.items()}
    steps = {k: jnp.asarray(v) for k, v in RT.step_tables(w, h).items()}

    H, W = h * 16, w * 16
    hy, wy = K_mcp.luma_ext_dims(W, H)
    hc, wc = K_mcp.chroma_ext_dims(W, H)
    rng = np.random.RandomState(0)
    ref_y = jnp.asarray(rng.randint(0, 256, (n_slots, hy, wy)), jnp.int32)
    ref_c = jnp.asarray(rng.randint(0, 256, (n_slots, hc, wc)), jnp.int32)

    # --- single stream steady state ---
    out = RT.decode_picture(arrs, ref_y, ref_c, steps,
                            w_mbs=w, h_mbs=h, chroma_qp_offset=cqo,
                            mc=mc, wf=mc)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = RT.decode_picture(arrs, ref_y, ref_c, steps,
                                w_mbs=w, h_mbs=h, chroma_qp_offset=cqo,
                                mc=mc, wf=mc)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    fps_single = 1.0 / dt

    # --- batched streams (DP) ---
    fps_batch = 0.0
    try:
        barrs = {k: jnp.broadcast_to(v[None], (BATCH,) + v.shape)
                 for k, v in arrs.items()}
        bref_y = jnp.broadcast_to(ref_y[None], (BATCH,) + ref_y.shape)
        bref_c = jnp.broadcast_to(ref_c[None], (BATCH,) + ref_c.shape)
        out = decode_pictures_batch(barrs, bref_y, bref_c, steps,
                                    w_mbs=w, h_mbs=h, chroma_qp_offset=cqo,
                                    mc=mc)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(max(REPS // 4, 2)):
            out = decode_pictures_batch(barrs, bref_y, bref_c,
                                        steps, w_mbs=w, h_mbs=h,
                                        chroma_qp_offset=cqo, mc=mc)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / max(REPS // 4, 2)
        fps_batch = BATCH / dt
    except Exception as e:
        sys.stderr.write(f"batch bench failed: {type(e).__name__}\n")

    fps = max(fps_single, fps_batch)
    print(json.dumps({
        "metric": f"frames/sec/chip {W_MBS * 16}x{H_MBS * 16} Baseline "
                  f"decode pixel pipeline (best of 1-stream, "
                  f"{BATCH}-stream batch)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "detail": {"fps_single": round(fps_single, 2),
                   "fps_batch_total": round(fps_batch, 2),
                   "batch": BATCH,
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()

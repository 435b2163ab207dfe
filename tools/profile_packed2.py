#!/usr/bin/env python3
"""Isolate the packed decode graph cost: steady-state reps of
decode_picture_packed vs the old decode_picture on the same picture."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench_common import bench_stream
    import broadway_tpu.core.decoder as DEC
    from broadway_tpu.core import packed as PK
    from broadway_tpu.core import recon_tpu as RT
    from broadway_tpu.ops.tpu import mc_pallas as K_mcp

    w_mbs, h_mbs = 120, 68
    data = bench_stream(w_mbs, h_mbs, n_frames=3)

    pics = []
    d = DEC.Decoder(backend="cpu",
                    recon_strategy=lambda dec, pic: (
                        pics.append((pic, dec.pps, len(dec.dpb.buffer))),
                        DEC.SKIP_RECON)[1])
    d.decode_annexb(data)
    pic, pps, n_slots = pics[-1]

    lay = PK.get_packed_layout(w_mbs, h_mbs)
    scratch = PK.PackScratch(lay)
    buf, kb = PK.pack_picture(pic, lay, scratch)
    print(f"kb={kb} buf={buf.nbytes / 1e6:.2f} MB", flush=True)
    dbuf = jax.device_put(buf)
    steps = {k: jnp.asarray(v)
             for k, v in RT.step_tables(w_mbs, h_mbs).items()}
    hy, wy = K_mcp.luma_ext_dims(w_mbs * 16, h_mbs * 16)
    hc, wc = K_mcp.chroma_ext_dims(w_mbs * 16, h_mbs * 16)
    ry = jnp.zeros((n_slots, hy, wy), jnp.int32)
    rc = jnp.zeros((n_slots, hc, wc), jnp.int32)
    be = "pallas"

    def run(ry, rc):
        return RT.decode_picture_packed(
            dbuf, ry, rc, 0, steps, lay=lay, kb=kb,
            constrained_intra=pps.constrained_intra_pred,
            chroma_qp_offset=pps.chroma_qp_index_offset, mc=be, wf=be)

    t0 = time.perf_counter()
    y, cb, cr, ry, rc = run(ry, rc)
    jax.block_until_ready(y)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    # steady state, chained via donated stacks (like the decoder does)
    t0 = time.perf_counter()
    for _ in range(8):
        y, cb, cr, ry, rc = run(ry, rc)
    jax.block_until_ready(y)
    print(f"packed steady: {(time.perf_counter() - t0) / 8 * 1e3:.1f} "
          f"ms/frame", flush=True)

    # per-call sync
    t0 = time.perf_counter()
    for _ in range(4):
        y, cb, cr, ry, rc = run(ry, rc)
        jax.block_until_ready(y)
    print(f"packed sync-each: {(time.perf_counter() - t0) / 4 * 1e3:.1f} "
          f"ms/frame", flush=True)

    # old path on same picture for comparison
    arrs = RT.host_picture_arrays(pic, pps.chroma_qp_index_offset,
                                  pps.constrained_intra_pred)
    arrs = {k: jnp.asarray(v) for k, v in arrs.items()}
    out = RT.decode_picture(arrs, ry, rc, steps, w_mbs=w_mbs, h_mbs=h_mbs,
                            chroma_qp_offset=pps.chroma_qp_index_offset,
                            mc=be, wf=be)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(8):
        out = RT.decode_picture(arrs, ry, rc, steps, w_mbs=w_mbs,
                                h_mbs=h_mbs,
                                chroma_qp_offset=pps.chroma_qp_index_offset,
                                mc=be, wf=be)
    jax.block_until_ready(out)
    print(f"old steady: {(time.perf_counter() - t0) / 8 * 1e3:.1f} "
          f"ms/frame", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dense-stream e2e breakdown (VERDICT r4 weak #5): where do the
frames/s go on the adversarial dense stream vs the realistic stream?

Phases measured per frame, steady-state:
  parse     host front-end (native CAVLC + slice scan), no recon
  pack      pack_picture_v2 + bucket expand (host)
  upload    device_put of the packed buffer
  device    decode_picture_packed2 graph (steady-state reps)
  e2e       full Decoder(backend="tpu") pass
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def run(name, data, w_mbs, h_mbs):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import broadway_tpu.core.decoder as DEC
    from broadway_tpu.core import packed as PK
    from broadway_tpu.core import recon_tpu as RT
    from broadway_tpu.ops.tpu import mc_pallas as K_mcp

    print(f"== {name}: {len(data)} bytes ==", flush=True)

    # parse-only (front-end + DPB bookkeeping, recon skipped)
    pics = []
    d = DEC.Decoder(backend="cpu",
                    recon_strategy=lambda dec, pic: (
                        pics.append((pic, dec.pps, len(dec.dpb.buffer))),
                        DEC.SKIP_RECON)[1])
    t0 = time.perf_counter()
    d.decode_annexb(data)
    t_parse = (time.perf_counter() - t0) / len(pics)
    print(f"parse : {t_parse * 1e3:7.2f} ms/frame ({len(pics)} frames)",
          flush=True)

    pic, pps, n_slots = pics[-1]
    lay = PK.get_packed_layout_v2(w_mbs, h_mbs)
    scratch = PK.PackScratchV2(lay)
    t0 = time.perf_counter()
    for _ in range(4):
        buf, bk = PK.pack_picture_v2(pic, lay, scratch)
    t_pack = (time.perf_counter() - t0) / 4
    print(f"pack  : {t_pack * 1e3:7.2f} ms/frame  bk={bk} "
          f"buf={buf.nbytes / 1e6:.2f} MB", flush=True)

    dbuf = jax.device_put(buf)
    jax.block_until_ready(dbuf)
    t0 = time.perf_counter()
    for _ in range(8):
        dbuf = jax.device_put(buf)
        jax.block_until_ready(dbuf)
    t_up = (time.perf_counter() - t0) / 8
    print(f"upload: {t_up * 1e3:7.2f} ms/frame "
          f"({buf.nbytes / t_up / 1e6:.0f} MB/s)", flush=True)

    W, H = w_mbs * 16, h_mbs * 16
    hy, wy = K_mcp.luma_ext_dims(W, H)
    hc, wc = K_mcp.chroma_ext_dims(W, H)
    rng = np.random.RandomState(0)
    ref_y = jnp.asarray(rng.randint(0, 256, (n_slots, hy, wy)), jnp.int32)
    ref_c = jnp.asarray(rng.randint(0, 256, (n_slots, hc, wc)), jnp.int32)
    steps = {k: jnp.asarray(v)
             for k, v in RT.step_tables(w_mbs, h_mbs).items()}
    slot = jnp.asarray(0)
    kw = dict(lay=lay, bk=bk,
              constrained_intra=pps.constrained_intra_pred,
              chroma_qp_offset=pps.chroma_qp_index_offset,
              mc="pallas", wf="pallas")
    out = RT.decode_picture_packed2(dbuf, ref_y, ref_c, slot, steps, **kw)
    jax.block_until_ready(out[0])
    y, cb, cr, yuv, ref_y, ref_c = out
    REPS = 16
    t0 = time.perf_counter()
    for _ in range(REPS):
        y, cb, cr, yuv, ref_y, ref_c = RT.decode_picture_packed2(
            dbuf, ref_y, ref_c, slot, steps, **kw)
    jax.block_until_ready(y)
    t_dev = (time.perf_counter() - t0) / REPS
    print(f"device: {t_dev * 1e3:7.2f} ms/frame", flush=True)

    d2 = DEC.Decoder(backend="tpu", parallel_slices=8)
    outs = d2.decode_annexb(data)
    jax.block_until_ready([o.frame.y for o in outs])
    d2 = DEC.Decoder(backend="tpu", parallel_slices=8)
    t0 = time.perf_counter()
    outs = d2.decode_annexb(data)
    jax.block_until_ready([o.frame.y for o in outs])
    t_e2e = (time.perf_counter() - t0) / len(outs)
    print(f"e2e   : {t_e2e * 1e3:7.2f} ms/frame "
          f"({1 / t_e2e:.2f} fps)", flush=True)
    print(f"sum(parse+pack+upload+device) = "
          f"{(t_parse + t_pack + t_up + t_dev) * 1e3:.2f} ms "
          f"(overlap headroom vs e2e: "
          f"{(t_parse + t_pack + t_up + t_dev - t_e2e) * 1e3:+.2f} ms)",
          flush=True)


def main():
    from bench_common import bench_stream, realistic_bench_stream
    w, h = 120, 68
    run("dense", bench_stream(w, h, n_frames=8), w, h)
    run("realistic", realistic_bench_stream(w, h, n_frames=16), w, h)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Device-graph stage split on the real chip: residual+MC+assembly
(run_stages=1), +intra wavefront (2), +deblock (3), on the realistic
and dense bench pictures. Isolates where the per-frame device
milliseconds go (the headline is device-bound as of round 5)."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); sys.path.insert(0, os.path.join(REPO, "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "build", "jaxcache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

def main():
    import jax, numpy as np, jax.numpy as jnp
    from bench_common import bench_stream, realistic_bench_stream, parse_pictures
    from broadway_tpu.core import recon_tpu as RT
    from broadway_tpu.ops.tpu import mc_pallas as K_mcp

    w, h = 120, 68
    for name, data in (("realistic", realistic_bench_stream(w, h, n_frames=16)),
                       ("dense", bench_stream(w, h, n_frames=8))):
        pics = parse_pictures(data, max_pics=3)
        arrs, wm, hm, cqo, n_slots = pics[-1]
        arrs = {k: jnp.asarray(v) for k, v in arrs.items()}
        steps = {k: jnp.asarray(v) for k, v in RT.step_tables(wm, hm).items()}
        H, W = hm * 16, wm * 16
        hy, wy = K_mcp.luma_ext_dims(W, H)
        hc, wc = K_mcp.chroma_ext_dims(W, H)
        rng = np.random.RandomState(0)
        ref_y = jnp.asarray(rng.randint(0, 256, (n_slots, hy, wy)), jnp.int32)
        ref_c = jnp.asarray(rng.randint(0, 256, (n_slots, hc, wc)), jnp.int32)
        REPS = 16
        print(f"== {name} ==", flush=True)
        prev = 0.0
        for rs, label in ((0, "residual+assemble (no MC)"),
                          (1, "+MC"), (2, "+intra wavefront"),
                          (3, "+deblock wavefront")):
            out = RT.decode_picture(arrs, ref_y, ref_c, steps, w_mbs=wm,
                                    h_mbs=hm, chroma_qp_offset=cqo,
                                    run_stages=rs, mc="pallas", wf="pallas")
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = RT.decode_picture(arrs, ref_y, ref_c, steps, w_mbs=wm,
                                        h_mbs=hm, chroma_qp_offset=cqo,
                                        run_stages=rs, mc="pallas", wf="pallas")
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / REPS * 1e3
            print(f"  run_stages={rs} {label:28s}: {dt:7.2f} ms "
                  f"(+{dt - prev:6.2f})", flush=True)
            prev = dt

if __name__ == "__main__":
    main()

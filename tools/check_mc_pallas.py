#!/usr/bin/env python3
"""Validate ops/tpu/mc_pallas against the NumPy MC oracle (ops/inter.py)
on random MV/ref fields covering all three kernel modes, including MVs far
outside the picture. Run on a TPU (or with --interpret on CPU)."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from broadway_tpu.ops import inter as O
    from broadway_tpu.ops.tpu import mc_pallas as K

    interpret = "--interpret" in sys.argv
    w_mbs, h_mbs = (6, 5) if interpret else (24, 16)
    W, H = w_mbs * 16, h_mbs * 16
    n = w_mbs * h_mbs
    R = 4
    rng = np.random.RandomState(7)

    planes_y = rng.randint(0, 256, (R, H, W)).astype(np.int32)
    planes_cb = rng.randint(0, 256, (R, H // 2, W // 2)).astype(np.int32)
    planes_cr = rng.randint(0, 256, (R, H // 2, W // 2)).astype(np.int32)

    # MV field: uniform MBs at every magnitude class — in-picture, window
    # clamped at the edge (the round-4 mode-0 bug class), fully
    # out-of-picture — plus small-spread, multi-ref, and per-block-huge.
    # Uniform MVs must sweep through and far past the picture edge so the
    # mode-0 fast path's clamped-window demotion is exercised on-chip.
    uni_mags = [0, 8, 60, W - 16, W, W + 8, 2 * W, 4 * W, 4 * H]
    mv = np.zeros((n, 4, 4, 2), np.int32)
    ref = np.zeros((n, 4, 4), np.int32)
    kind = rng.randint(0, 10, n)
    for m in range(n):
        if kind[m] < 5:        # uniform (all magnitudes, signed, qpel)
            mag = uni_mags[rng.randint(len(uni_mags))]
            v = np.array([rng.choice([-1, 1]) * (4 * mag + rng.randint(4)),
                          rng.choice([-1, 1])
                          * (4 * uni_mags[rng.randint(len(uni_mags))]
                             + rng.randint(4))])
            mv[m, :, :] = v
            ref[m, :, :] = rng.randint(0, R)
        elif kind[m] < 7:      # small spread, single ref
            base = rng.randint(-40, 40, 2)
            mv[m] = base + rng.randint(-8, 8, (4, 4, 2))
            ref[m, :, :] = rng.randint(0, R)
        elif kind[m] < 9:      # multi-ref quadrants
            for qy in range(2):
                for qx in range(2):
                    v = rng.randint(-40, 40, 2)
                    mv[m, 2*qy:2*qy+2, 2*qx:2*qx+2] = v
                    ref[m, 2*qy:2*qy+2, 2*qx:2*qx+2] = rng.randint(0, R)
        else:                  # huge/out-of-pic MVs, per-block
            mv[m] = rng.randint(-4 * W, 4 * W, (4, 4, 2))
            ref[m, :, :] = rng.randint(0, R)

    tabs = K.mc_tables(mv, ref, W, H)
    modes = tabs["scal0"] & 3
    print("mode histogram:", np.bincount(modes, minlength=3))

    ref_y = jnp.stack([K.pad_luma(jnp.asarray(p)) for p in planes_y])
    ref_c = jnp.stack([K.pad_chroma(jnp.asarray(b), jnp.asarray(r))
                       for b, r in zip(planes_cb, planes_cr)])
    tabs_j = {k: jnp.asarray(v) for k, v in tabs.items()}

    t0 = time.time()
    pred_y, pred_c = K.mc_predict(ref_y, ref_c, tabs_j, interpret=interpret)
    pred_y = np.asarray(jax.block_until_ready(pred_y))
    pred_c = np.asarray(jax.block_until_ready(pred_c))
    print("kernel compile+run:", round(time.time() - t0, 1), "s")

    # oracle per 4x4 block
    bad = 0
    for m in range(n):
        px, py = (m % w_mbs) * 16, (m // w_mbs) * 16
        for by in range(4):
            for bx in range(4):
                r = ref[m, by, bx]
                vx, vy = int(mv[m, by, bx, 0]), int(mv[m, by, bx, 1])
                ey = O.mc_luma(planes_y[r], px + bx * 4, py + by * 4,
                               vx, vy, 4, 4)
                gy = pred_y[m, by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                ecb = O.mc_chroma(planes_cb[r], px // 2 + bx * 2,
                                  py // 2 + by * 2, vx, vy, 2, 2)
                ecr = O.mc_chroma(planes_cr[r], px // 2 + bx * 2,
                                  py // 2 + by * 2, vx, vy, 2, 2)
                gcb = pred_c[m, by * 2:by * 2 + 2, bx * 4:bx * 4 + 4:2]
                gcr = pred_c[m, by * 2:by * 2 + 2, bx * 4 + 1:bx * 4 + 4:2]
                if not (np.array_equal(ey, gy) and np.array_equal(ecb, gcb)
                        and np.array_equal(ecr, gcr)):
                    if bad < 5:
                        print(f"MISMATCH mb={m} mode={modes[m]} blk=({by},"
                              f"{bx}) mv=({vx},{vy}) ref={r}")
                        print(" luma exp", ey[0], "got", gy[0])
                        print(" cb  exp", ecb[0], "got", gcb[0])
                    bad += 1
    print("mismatching blocks:", bad, "/", n * 16)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

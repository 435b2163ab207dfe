"""Intra prediction stage — wavefront reconstruction in JAX (jit/TPU).

Twin of ops/intra.py (NumPy oracle). TPU-first design: intra MBs are
processed over x+2y anti-diagonals (classic H.264 wavefront — an MB
depends on A/B/C/D neighbours only), one lax.scan step per diagonal, all
MBs of a diagonal batched. Every Intra4x4 mode is expressed as a
<=3-tap integer combination of the 13 neighbour pels
(v = [upleft, up0..7, left0..3]), precomputed as static index/coefficient
tables so the 9-way mode dispatch becomes a single gather+select.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Intra4x4 3-tap tables: pixel(mode, y, x) = (sum c_k * v[i_k] + rnd) >> shift
# v layout: v[0] = upleft, v[1+i] = up_i (i 0..7), v[9+i] = left_i (i 0..3)
# Mode 2 (DC) is availability-dependent and handled separately (slot holds
# zeros there).
# ---------------------------------------------------------------------------

N_MODES = 9
IDX = np.zeros((N_MODES, 4, 4, 3), np.int32)
COEF = np.zeros((N_MODES, 4, 4, 3), np.int32)
RND = np.zeros((N_MODES, 4, 4), np.int32)
SHIFT = np.zeros((N_MODES, 4, 4), np.int32)


def _set(m, y, x, taps, rnd, shift):
    for k, (idx, c) in enumerate(taps):
        IDX[m, y, x, k] = idx
        COEF[m, y, x, k] = c
    RND[m, y, x] = rnd
    SHIFT[m, y, x] = shift


def _u(i):  # up pel index in v (i may be -1 = upleft)
    return 0 if i < 0 else 1 + i


def _l(i):  # left pel index in v (i may be -1 = upleft)
    return 0 if i < 0 else 9 + i


for y in range(4):
    for x in range(4):
        _set(0, y, x, [(_u(x), 1)], 0, 0)                      # vertical
        _set(1, y, x, [(_l(y), 1)], 0, 0)                      # horizontal
        # mode 3: diagonal down-left
        i = x + y
        if i == 6:
            _set(3, y, x, [(_u(6), 1), (_u(7), 3)], 2, 2)
        else:
            _set(3, y, x, [(_u(i), 1), (_u(i + 1), 2), (_u(i + 2), 1)], 2, 2)
        # mode 4: diagonal down-right
        if x > y:
            i = x - y
            _set(4, y, x, [(_u(i - 2), 1), (_u(i - 1), 2), (_u(i), 1)], 2, 2)
        elif x < y:
            i = y - x
            _set(4, y, x, [(_l(i - 2), 1), (_l(i - 1), 2), (_l(i), 1)], 2, 2)
        else:
            _set(4, y, x, [(_u(0), 1), (0, 2), (_l(0), 1)], 2, 2)
        # mode 5: vertical-right
        zv = 2 * x - y
        i = x - (y >> 1)
        if zv >= 0 and zv % 2 == 0:
            _set(5, y, x, [(_u(i - 1), 1), (_u(i), 1)], 1, 1)
        elif zv >= 0:
            _set(5, y, x, [(_u(i - 2), 1), (_u(i - 1), 2), (_u(i), 1)], 2, 2)
        elif zv == -1:
            _set(5, y, x, [(_l(0), 1), (0, 2), (_u(0), 1)], 2, 2)
        else:
            k = y - 2 * x
            _set(5, y, x, [(_l(k - 1), 1), (_l(k - 2), 2), (_l(k - 3), 1)],
                 2, 2)
        # mode 6: horizontal-down
        zh = 2 * y - x
        i = y - (x >> 1)
        if zh >= 0 and zh % 2 == 0:
            _set(6, y, x, [(_l(i - 1), 1), (_l(i), 1)], 1, 1)
        elif zh >= 0:
            _set(6, y, x, [(_l(i - 2), 1), (_l(i - 1), 2), (_l(i), 1)], 2, 2)
        elif zh == -1:
            _set(6, y, x, [(_u(0), 1), (0, 2), (_l(0), 1)], 2, 2)
        else:
            k = x - 2 * y
            _set(6, y, x, [(_u(k - 1), 1), (_u(k - 2), 2), (_u(k - 3), 1)],
                 2, 2)
        # mode 7: vertical-left
        i = x + (y >> 1)
        if y % 2 == 0:
            _set(7, y, x, [(_u(i), 1), (_u(i + 1), 1)], 1, 1)
        else:
            _set(7, y, x, [(_u(i), 1), (_u(i + 1), 2), (_u(i + 2), 1)], 2, 2)
        # mode 8: horizontal-up
        zv = x + 2 * y
        i = y + (x >> 1)
        if zv <= 4 and zv % 2 == 0:
            _set(8, y, x, [(_l(i), 1), (_l(i + 1), 1)], 1, 1)
        elif zv <= 4:
            _set(8, y, x, [(_l(i), 1), (_l(i + 1), 2), (_l(i + 2), 1)], 2, 2)
        elif zv == 5:
            _set(8, y, x, [(_l(2), 1), (_l(3), 3)], 2, 2)
        else:
            _set(8, y, x, [(_l(3), 1)], 0, 0)

IDX_J = jnp.asarray(IDX)
COEF_J = jnp.asarray(COEF)
RND_J = jnp.asarray(RND)
SHIFT_J = jnp.asarray(SHIFT)

# blocks (bx,by) with no up-right inside the MB (z-order decode)
NO_UPRIGHT = {(1, 1), (3, 1), (1, 3), (3, 2), (3, 3)}
BLK_ORDER = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
             (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3)]


def predict_i4x4_batch(v: jnp.ndarray, mode: jnp.ndarray,
                       avail_up: jnp.ndarray,
                       avail_left: jnp.ndarray) -> jnp.ndarray:
    """v: [M, 13] int32 neighbour pels; mode: [M]; -> [M, 4, 4]."""
    taps = v[:, IDX_J]                     # [M, 9, 4, 4, 3]
    lin = (taps * COEF_J[None]).sum(-1)
    pred = (lin + RND_J[None]) >> SHIFT_J[None]          # [M,9,4,4]
    # DC (mode 2)
    up_sum = v[:, 1:5].sum(-1)
    left_sum = v[:, 9:13].sum(-1)
    dc = jnp.where(
        avail_up & avail_left, (up_sum + left_sum + 4) >> 3,
        jnp.where(avail_up, (up_sum + 2) >> 2,
                  jnp.where(avail_left, (left_sum + 2) >> 2, 128)))
    pred = pred.at[:, 2].set(dc[:, None, None])
    sel = jnp.take_along_axis(pred, mode[:, None, None, None], axis=1)
    return sel[:, 0]


def predict_i16_batch(up: jnp.ndarray, left: jnp.ndarray, ul: jnp.ndarray,
                      mode: jnp.ndarray, avail_up: jnp.ndarray,
                      avail_left: jnp.ndarray) -> jnp.ndarray:
    """up/left: [M,16], ul: [M]; mode [M] -> [M,16,16]."""
    M = up.shape[0]
    vert = jnp.broadcast_to(up[:, None, :], (M, 16, 16))
    hor = jnp.broadcast_to(left[:, :, None], (M, 16, 16))
    up_sum = up.sum(-1)
    left_sum = left.sum(-1)
    dcv = jnp.where(
        avail_up & avail_left, (up_sum + left_sum + 16) >> 5,
        jnp.where(avail_up, (up_sum + 8) >> 4,
                  jnp.where(avail_left, (left_sum + 8) >> 4, 128)))
    dc = jnp.broadcast_to(dcv[:, None, None], (M, 16, 16))
    xs = jnp.arange(8)
    upext = jnp.concatenate([ul[:, None], up[:, :7]], axis=1)   # idx 7-xs
    lext = jnp.concatenate([ul[:, None], left[:, :7]], axis=1)
    h = ((xs + 1)[None] * (up[:, 8 + xs] - upext[:, 7 - xs])).sum(-1)
    vv = ((xs + 1)[None] * (left[:, 8 + xs] - lext[:, 7 - xs])).sum(-1)
    b = (5 * h + 32) >> 6
    c = (5 * vv + 32) >> 6
    a = 16 * (up[:, 15] + left[:, 15])
    gy, gx = jnp.mgrid[0:16, 0:16]
    plane = jnp.clip(
        (a[:, None, None] + b[:, None, None] * (gx - 7)[None]
         + c[:, None, None] * (gy - 7)[None] + 16) >> 5, 0, 255)
    modes = jnp.stack([vert, hor, dc, plane], axis=1)
    return jnp.take_along_axis(
        modes, mode[:, None, None, None], axis=1)[:, 0]


def predict_chroma_batch(up: jnp.ndarray, left: jnp.ndarray, ul: jnp.ndarray,
                         mode: jnp.ndarray, avail_up: jnp.ndarray,
                         avail_left: jnp.ndarray) -> jnp.ndarray:
    """up/left: [M,8], ul: [M]; -> [M,8,8]."""
    M = up.shape[0]
    # DC per 4x4 sub-block
    us = up.reshape(M, 2, 4).sum(-1)        # [M,2] sums of up halves
    ls = left.reshape(M, 2, 4).sum(-1)
    both = avail_up & avail_left

    def dc_both(cx, cy):
        if (cx, cy) in ((0, 0), (1, 1)):
            return (us[:, cx] + ls[:, cy] + 4) >> 3
        if cx == 1:
            return (us[:, 1] + 2) >> 2
        return (ls[:, 1] + 2) >> 2

    def dc_up(cx, cy):
        return (us[:, cx] + 2) >> 2

    def dc_left(cx, cy):
        return (ls[:, cy] + 2) >> 2

    dc = jnp.zeros((M, 8, 8), jnp.int32)
    for cy in range(2):
        for cx in range(2):
            val = jnp.where(
                both, dc_both(cx, cy),
                jnp.where(avail_up, dc_up(cx, cy),
                          jnp.where(avail_left, dc_left(cx, cy), 128)))
            dc = dc.at[:, cy * 4:cy * 4 + 4, cx * 4:cx * 4 + 4].set(
                val[:, None, None])
    hor = jnp.broadcast_to(left[:, :, None], (M, 8, 8))
    vert = jnp.broadcast_to(up[:, None, :], (M, 8, 8))
    xs = jnp.arange(4)
    upext = jnp.concatenate([ul[:, None], up[:, :3]], axis=1)
    lext = jnp.concatenate([ul[:, None], left[:, :3]], axis=1)
    h = ((xs + 1)[None] * (up[:, 4 + xs] - upext[:, 3 - xs])).sum(-1)
    vv = ((xs + 1)[None] * (left[:, 4 + xs] - lext[:, 3 - xs])).sum(-1)
    b = (17 * h + 16) >> 5
    c = (17 * vv + 16) >> 5
    a = 16 * (up[:, 7] + left[:, 7])
    gy, gx = jnp.mgrid[0:8, 0:8]
    plane = jnp.clip(
        (a[:, None, None] + b[:, None, None] * (gx - 3)[None]
         + c[:, None, None] * (gy - 3)[None] + 16) >> 5, 0, 255)
    modes = jnp.stack([dc, hor, vert, plane], axis=1)
    return jnp.take_along_axis(
        modes, mode[:, None, None, None], axis=1)[:, 0]

"""Inter prediction stage — batched quarter-pel MC in JAX (jit/TPU).

Twin of ops/inter.py (NumPy oracle). All 4x4 luma blocks (and their 2x2
chroma blocks) are predicted in one batched pass: per-block edge-clamped
10x10 window gather from pre-padded reference planes (edge-replicated
padding == h264bsdFillBlock semantics, h264bsd_reconstruct.c:2222), 6-tap
(1,-5,20,20,-5,1) half-pel filters, branchless selection over the 16
fractional positions (lumaFracPos dispatch, h264bsd_reconstruct.c:1819).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PAD = 24  # >= window clamp reach; references stored edge-padded by PAD


def pad_plane(plane: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(plane, PAD, mode="edge")


def _tap6(a, axis):
    n = a.shape[axis] - 5
    sl = [slice(None)] * a.ndim

    def s(i):
        t = list(sl)
        t[axis] = slice(i, i + n)
        return a[tuple(t)]
    return s(0) - 5 * s(1) + 20 * s(2) + 20 * s(3) - 5 * s(4) + s(5)


def _clip8(a):
    return jnp.clip(a, 0, 255)


def mc_luma_blocks(ref_stack_padded: jnp.ndarray, ref_idx: jnp.ndarray,
                   px: jnp.ndarray, py: jnp.ndarray,
                   mvx: jnp.ndarray, mvy: jnp.ndarray) -> jnp.ndarray:
    """Predict N 4x4 luma blocks -> [N, 4, 4] int32 in [0,255].

    ref_stack_padded: [R, H+2P, W+2P] int32; ref_idx/px/py/mvx/mvy: [N].
    """
    Hp, Wp = ref_stack_padded.shape[1], ref_stack_padded.shape[2]
    xi = px + (mvx >> 2)
    yi = py + (mvy >> 2)
    fx = mvx & 3
    fy = mvy & 3
    x0 = jnp.clip(xi - 2 + PAD, 0, Wp - 10)
    y0 = jnp.clip(yi - 2 + PAD, 0, Hp - 10)

    def gather(r, yy, xx):
        return jax.lax.dynamic_slice(ref_stack_padded, (r, yy, xx),
                                     (1, 10, 10))[0]

    win = jax.vmap(gather)(ref_idx, y0, x0)              # [N,10,10]

    raw_h = _tap6(win, 2)                                # [N,10,5]
    b = _clip8((raw_h[:, 2:7, :] + 16) >> 5)             # [N,5,5] rows y..y+4
    hh = _clip8((_tap6(win[:, :, 2:7], 1) + 16) >> 5)    # [N,5,5]
    jj = _clip8((_tap6(raw_h, 1) + 512) >> 10)           # [N,5,5]
    g = win[:, 2:7, 2:7]                                 # [N,5,5]

    g00, g01, g10 = g[:, :4, :4], g[:, :4, 1:5], g[:, 1:5, :4]
    b0, b1 = b[:, :4, :4], b[:, 1:5, :4]
    h0, h1 = hh[:, :4, :4], hh[:, :4, 1:5]
    j0 = jj[:, :4, :4]

    def avg(a, c):
        return (a + c + 1) >> 1

    cand = jnp.stack([
        g00,                # (fx0, fy0)
        avg(g00, b0),       # (1,0)
        b0,                 # (2,0)
        avg(g01, b0),       # (3,0)
        avg(g00, h0),       # (0,1)
        avg(b0, h0),        # (1,1)
        avg(j0, b0),        # (2,1)
        avg(b0, h1),        # (3,1)
        h0,                 # (0,2)
        avg(j0, h0),        # (1,2)
        j0,                 # (2,2)
        avg(j0, h1),        # (3,2)
        avg(g10, h0),       # (0,3)
        avg(b1, h0),        # (1,3)
        avg(j0, b1),        # (2,3)
        avg(b1, h1),        # (3,3)
    ], axis=0)                                          # [16,N,4,4]
    case = fy * 4 + fx                                  # [N]
    out = jnp.take_along_axis(
        cand, case[None, :, None, None], axis=0)[0]
    return out.astype(jnp.int32)


def mc_chroma_blocks(ref_stack_padded: jnp.ndarray, ref_idx: jnp.ndarray,
                     px: jnp.ndarray, py: jnp.ndarray,
                     mvx: jnp.ndarray, mvy: jnp.ndarray) -> jnp.ndarray:
    """Predict N 2x2 chroma blocks -> [N, 2, 2] int32."""
    Hp, Wp = ref_stack_padded.shape[1], ref_stack_padded.shape[2]
    xi = px + (mvx >> 3)
    yi = py + (mvy >> 3)
    dx = mvx & 7
    dy = mvy & 7
    x0 = jnp.clip(xi + PAD, 0, Wp - 3)
    y0 = jnp.clip(yi + PAD, 0, Hp - 3)

    def gather(r, yy, xx):
        return jax.lax.dynamic_slice(ref_stack_padded, (r, yy, xx),
                                     (1, 3, 3))[0]

    win = jax.vmap(gather)(ref_idx, y0, x0)              # [N,3,3]
    A = win[:, :2, :2]
    B = win[:, :2, 1:3]
    C = win[:, 1:3, :2]
    D = win[:, 1:3, 1:3]
    dx = dx[:, None, None]
    dy = dy[:, None, None]
    return (((8 - dx) * (8 - dy) * A + dx * (8 - dy) * B +
             (8 - dx) * dy * C + dx * dy * D + 32) >> 6).astype(jnp.int32)

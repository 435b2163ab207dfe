"""Deblocking stage — wavefront in JAX (jit/TPU).

Twin of core/deblock_impl.py (NumPy oracle). Boundary strengths and
thresholds are computed for the whole picture in one vectorized pass;
edge filtering runs over x+2y anti-diagonals (deblock of an MB depends on
A, B and the up-right MB's left-edge writes — all on earlier diagonals),
one lax.scan step per diagonal. Within an MB the 4 vertical edge columns
are applied sequentially (later columns read earlier writes), then the 4
horizontal edge rows — equivalent to the reference's per-block-row
interleave (h264bsd_deblocking.c:1542 FilterLuma; see deblock_impl docs).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.deblock_impl import ALPHAS, BETAS, RASTER_TO_Z, TC0
from .residual import QP_C_J

ALPHAS_J = jnp.asarray(ALPHAS)
BETAS_J = jnp.asarray(BETAS)
TC0_J = jnp.asarray(TC0)
R2Z = jnp.asarray(np.array(RASTER_TO_Z, np.int32))


def boundary_strengths(tc4, mv, ref_id, intra, FT, FL, w_mbs, h_mbs):
    """Vectorized bS for every luma edge.

    tc4 [n,4,4] totalCoeff (raster block coords), mv [n,4,4,2],
    ref_id [n,2,2], intra [n] bool, FT/FL [n] bool.
    Returns (bs_top [n,4,4], bs_left [n,4,4]) int32, raster block coords
    ([row, col] of the edge's q-side block).
    """
    n = w_mbs * h_mbs
    g = lambda a: a.reshape(h_mbs, w_mbs, *a.shape[1:])
    tcg, mvg, rfg = g(tc4), g(mv), g(ref_id)
    intrag = g(intra)

    def bs_pair(tc_a, tc_b, mv_a, mv_b, rf_a, rf_b):
        coeff = (tc_a > 0) | (tc_b > 0)
        mvd = (jnp.abs(mv_a[..., 0] - mv_b[..., 0]) >= 4) | \
              (jnp.abs(mv_a[..., 1] - mv_b[..., 1]) >= 4)
        refd = rf_a != rf_b
        return jnp.where(coeff, 2, jnp.where(mvd | refd, 1, 0))

    # inner top edges (rows 1..3): q block (r, c), p block (r-1, c)
    ref_blk = jnp.repeat(jnp.repeat(rfg, 2, axis=2), 2, axis=3)  # [h,w,4,4]
    inner_top = bs_pair(tcg[:, :, 1:, :], tcg[:, :, :3, :],
                        mvg[:, :, 1:, :], mvg[:, :, :3, :],
                        ref_blk[:, :, 1:, :], ref_blk[:, :, :3, :])
    inner_left = bs_pair(tcg[:, :, :, 1:], tcg[:, :, :, :3],
                         mvg[:, :, :, 1:], mvg[:, :, :, :3],
                         ref_blk[:, :, :, 1:], ref_blk[:, :, :, :3])

    # MB top edge: q = (0, c) of MB (y,x), p = (3, c) of MB (y-1,x)
    ztop = jnp.zeros((1, w_mbs, 4), jnp.int32)
    tc_b = jnp.concatenate([ztop, tcg[:-1, :, 3, :]], axis=0)
    mv_b = jnp.concatenate([jnp.zeros((1, w_mbs, 4, 2), mv.dtype),
                            mvg[:-1, :, 3, :]], axis=0)
    rf_b = jnp.concatenate([jnp.zeros((1, w_mbs, 4), ref_id.dtype),
                            ref_blk[:-1, :, 3, :]], axis=0)
    intra_b = jnp.concatenate([jnp.zeros((1, w_mbs), bool),
                               intrag[:-1]], axis=0)
    top_edge = bs_pair(tcg[:, :, 0, :], tc_b, mvg[:, :, 0, :], mv_b,
                       ref_blk[:, :, 0, :], rf_b)
    top_edge = jnp.where((intrag | intra_b)[..., None], 4, top_edge)
    top_edge = jnp.where(g(FT)[..., None], top_edge, 0)

    # MB left edge
    zl = jnp.zeros((h_mbs, 1, 4), jnp.int32)
    tc_a = jnp.concatenate([zl, tcg[:, :-1, :, 3]], axis=1)
    mv_a = jnp.concatenate([jnp.zeros((h_mbs, 1, 4, 2), mv.dtype),
                            mvg[:, :-1, :, 3]], axis=1)
    rf_a = jnp.concatenate([jnp.zeros((h_mbs, 1, 4), ref_id.dtype),
                            ref_blk[:, :-1, :, 3]], axis=1)
    intra_a = jnp.concatenate([jnp.zeros((h_mbs, 1), bool),
                               intrag[:, :-1]], axis=1)
    left_edge = bs_pair(tcg[:, :, :, 0], tc_a, mvg[:, :, :, 0], mv_a,
                        ref_blk[:, :, :, 0], rf_a)
    left_edge = jnp.where((intrag | intra_a)[..., None], 4, left_edge)
    left_edge = jnp.where(g(FL)[..., None], left_edge, 0)

    inner_top = jnp.where(intrag[..., None, None], 3, inner_top)
    inner_left = jnp.where(intrag[..., None, None], 3, inner_left)

    bs_top = jnp.concatenate([top_edge[:, :, None, :], inner_top], axis=2)
    bs_left = jnp.concatenate([left_edge[:, :, :, None], inner_left],
                              axis=3)
    # disabled MBs (idc==1) never filter: caller masks via FT/FL and inner
    return bs_top.reshape(n, 4, 4), bs_left.reshape(n, 4, 4)


def edge_thresholds(qp, qp_a, qp_b, offA, offB, chroma_off=None):
    """Per-MB (alpha, beta, indexA) for inner/top/left edge classes.
    qp/qp_a/qp_b [n] (neighbour MB qp; unused entries arbitrary).
    Returns dict of [n] arrays."""
    def qmap(q):
        if chroma_off is None:
            return q
        return QP_C_J[jnp.clip(q + chroma_off, 0, 51)]

    def mk(q):
        ia = jnp.clip(q + offA, 0, 51)
        ib = jnp.clip(q + offB, 0, 51)
        return ALPHAS_J[ia], BETAS_J[ib], ia

    qm = qmap(qp)
    inner = mk(qm)
    topq = jnp.where(qp_b != qp, (qm + qmap(qp_b) + 1) >> 1, qm)
    leftq = jnp.where(qp_a != qp, (qm + qmap(qp_a) + 1) >> 1, qm)
    return {"inner": inner, "top": mk(topq), "left": mk(leftq)}


def filter_lines_luma(p3, p2, p1, p0, q0, q1, q2, q3, bs, alpha, beta, ia):
    """Vectorized luma edge filter over lines. All args broadcastable
    int32; bs [.,L]; alpha/beta/ia broadcast. Returns the six written
    values (p2',p1',p0',q0',q1',q2')."""
    gate = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta

    # normal (bs < 4)
    tc0v = TC0_J[ia, jnp.clip(bs - 1, 0, 2)]
    half = (p0 + q0 + 1) >> 1
    p1n = p1 + jnp.clip((p2 + half - (p1 << 1)) >> 1, -tc0v, tc0v)
    q1n = q1 + jnp.clip((q2 + half - (q1 << 1)) >> 1, -tc0v, tc0v)
    tc = tc0v + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0n = jnp.clip(p0 + delta, 0, 255)
    q0n = jnp.clip(q0 - delta, 0, 255)

    # strong (bs == 4)
    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    tp = p1 + p0 + q0
    p0s = jnp.where(strong & ap, (p2 + 2 * tp + q1 + 4) >> 3,
                    (2 * p1 + p0 + q1 + 2) >> 2)
    p1s = jnp.where(strong & ap, (p2 + tp + 2) >> 2, p1)
    p2s = jnp.where(strong & ap, (2 * p3 + 3 * p2 + tp + 4) >> 3, p2)
    tq = p0 + q0 + q1
    q0s = jnp.where(strong & aq, (p1 + 2 * tq + q2 + 4) >> 3,
                    (2 * q1 + q0 + p1 + 2) >> 2)
    q1s = jnp.where(strong & aq, (tq + q2 + 2) >> 2, q1)
    q2s = jnp.where(strong & aq, (2 * q3 + 3 * q2 + tq + 4) >> 3, q2)

    is4 = bs == 4
    p2o = jnp.where(gate & is4, p2s, p2)
    p1o = jnp.where(gate, jnp.where(is4, p1s, jnp.where(ap, p1n, p1)), p1)
    p0o = jnp.where(gate, jnp.where(is4, p0s, p0n), p0)
    q0o = jnp.where(gate, jnp.where(is4, q0s, q0n), q0)
    q1o = jnp.where(gate, jnp.where(is4, q1s, jnp.where(aq, q1n, q1)), q1)
    q2o = jnp.where(gate & is4, q2s, q2)
    return p2o, p1o, p0o, q0o, q1o, q2o


def filter_lines_chroma(p1, p0, q0, q1, bs, alpha, beta, ia):
    gate = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    tc = TC0_J[ia, jnp.clip(bs - 1, 0, 2)] + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0n = jnp.clip(p0 + delta, 0, 255)
    q0n = jnp.clip(q0 - delta, 0, 255)
    p0s = (2 * p1 + p0 + q1 + 2) >> 2
    q0s = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    p0o = jnp.where(gate, jnp.where(is4, p0s, p0n), p0)
    q0o = jnp.where(gate, jnp.where(is4, q0s, q0n), q0)
    return p0o, q0o

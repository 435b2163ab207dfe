"""Wavefront stages (intra prediction + deblocking) as Pallas TPU kernels.

The reference applies these as sequential per-MB raster loops
(h264bsd_intra_prediction.c, h264bsd_deblocking.c:574 raster scan); the
asm backends (SURVEY.md §2.4: PredictIntra_4x4/16x16, FilterDeblocking
Luma/Chroma VerEdge/HorEdge) vectorize only within an edge.  Here the
x+2y anti-diagonal wavefront (MB depends on A/B/C/D neighbours only) is
the sequential grid dimension of a Pallas kernel; all MBs of a diagonal
(the LS sublane axis) process in parallel on the VPU.

Layout: pixel rows are LANE-MAJOR — one diagonal row is [LS, 256] int32
with lane 16*py+px (luma) / [LS, 128] with cb at 8*py+px, cr at 64+...
(chroma).  This hits the (8,128) tile exactly (no padding bloat) and
makes horizontal-edge work static lane slices.  Column access (vertical
edges, left-neighbour pels) uses an exact one-hot transpose matmul on
the MXU (pixel values <= 255 are exact in bf16).

Streaming: rows live in HBM ([S, LS, 256] packed tensors); the kernel
keeps a 4-deep VMEM ring of diagonals (a row is read at step d and
last modified at step d+2 as the 'up' neighbour, so it is final and
DMA'd out at the end of step d+2).

Boundary strengths and alpha/beta/tc0 thresholds are data-parallel over
the whole picture and precomputed OUTSIDE the kernel (ops/tpu/deblock
.boundary_strengths / .edge_thresholds); the kernel receives them as
per-MB param lanes, so no table gathers run inside.

Bit-exactness oracle: the lax.scan wavefront in core/recon_tpu.py
(itself validated against the C reference decoder).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import intra as K_in

# ---------------------------------------------------------------------
# constant one-hot transpose matrices (bf16-exact for values <= 255)
# ---------------------------------------------------------------------

def _transpose_mat(n: int) -> np.ndarray:
    """M[L, n*x + y] = 1 where L = n*y + x  (within-MB transpose)."""
    m = np.zeros((n * n, n * n), np.float32)
    for y in range(n):
        for x in range(n):
            m[n * y + x, n * x + y] = 1.0
    return m


_MT16 = _transpose_mat(16)                       # luma [256,256]
_MT8 = np.zeros((128, 128), np.float32)          # chroma cb|cr blocks
_MT8[0:64, 0:64] = _transpose_mat(8)
_MT8[64:128, 64:128] = _transpose_mat(8)


def _tmul(x, m):
    """Exact one-hot transpose: x @ m (values <= 255, bf16-exact)."""
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), m,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)


def _luma_edge(p3, p2, p1, p0, q0, q1, q2, q3, bs, alpha, beta,
               t0, t1, t2):
    """filter_lines_luma with tc0 passed as per-bs values (no table)."""
    gate = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    tc0v = jnp.where(bs == 1, t0, jnp.where(bs == 2, t1, t2))
    half = (p0 + q0 + 1) >> 1
    p1n = p1 + jnp.clip((p2 + half - (p1 << 1)) >> 1, -tc0v, tc0v)
    q1n = q1 + jnp.clip((q2 + half - (q1 << 1)) >> 1, -tc0v, tc0v)
    tc = tc0v + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0n = jnp.clip(p0 + delta, 0, 255)
    q0n = jnp.clip(q0 - delta, 0, 255)
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


def _chroma_edge(p1, p0, q0, q1, bs, alpha, beta, t0, t1, t2):
    gate = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    tc = jnp.where(bs == 1, t0, jnp.where(bs == 2, t1, t2)) + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0n = jnp.clip(p0 + delta, 0, 255)
    q0n = jnp.clip(q0 - delta, 0, 255)
    p0s = (2 * p1 + p0 + q1 + 2) >> 2
    q0s = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    p0o = jnp.where(gate, jnp.where(is4, p0s, p0n), p0)
    q0o = jnp.where(gate, jnp.where(is4, q0s, q0n), q0)
    return p0o, q0o


# ---------------------------------------------------------------------
# deblock kernel
#
# P param lanes per MB (int32 [LS, 128]):
#   [0:16]   bs vertical edge e=c/4 at lanes 4e+r (line block r)
#   [16:32]  bs horizontal edge e=r/4 at lanes 4e+c
#   [32:37]  luma inner  (alpha, beta, tc0[0..2])
#   [37:42]  luma top    ( " )
#   [42:47]  luma left   ( " )
#   [47:52]  chroma inner / [52:57] top / [57:62] left
# ---------------------------------------------------------------------


def _set_lanes(arr, start, *parts):
    """Replace arr[:, start:start+sum(widths)] by the given parts."""
    w = sum(int(x.shape[1]) for x in parts)
    segs = []
    if start > 0:
        segs.append(arr[:, :start])
    segs.extend(parts)
    if start + w < arr.shape[1]:
        segs.append(arr[:, start + w:])
    return jnp.concatenate(segs, axis=1)


def _rep4(x):
    """[LS,4] -> [LS,16] each value repeated 4x (consecutive)."""
    return pltpu.repeat(x, 4, axis=1)


def _db_kernel(M16, M8, Y, C, P, Yo, Co, yr, cr_, pr, sems, osems):
    _t16 = lambda x: _tmul(x, M16[...])
    _t8 = lambda x: _tmul(x, M8[...])
    d = pl.program_id(0)
    S = pl.num_programs(0)
    sl = d % 4

    # software pipeline: row d's loads were issued at step d-1; issue
    # row d+1 now; out-DMAs are waited only when their slot is reused.
    def in_copies(row, par):
        return [pltpu.make_async_copy(Y.at[row], yr.at[row % 4],
                                      sems.at[par, 0]),
                pltpu.make_async_copy(C.at[row], cr_.at[row % 4],
                                      sems.at[par, 1]),
                pltpu.make_async_copy(P.at[row], pr.at[row % 2],
                                      sems.at[par, 2])]

    def out_copies(row, par):
        return [pltpu.make_async_copy(yr.at[row % 4], Yo.at[row],
                                      osems.at[par, 0]),
                pltpu.make_async_copy(cr_.at[row % 4], Co.at[row],
                                      osems.at[par, 1])]

    @pl.when(d == 0)
    def _():
        for cp in in_copies(0, 0):
            cp.start()

    for cp in in_copies(d, d % 2):
        cp.wait()

    @pl.when(d + 1 < S)
    def _():
        @pl.when(d >= 3)
        def _():
            # slot (d+1)%4 held row d-3; its out was issued at step d-1
            for cp in out_copies(d - 3, (d - 1) % 2):
                cp.wait()
        for cp in in_copies(d + 1, (d + 1) % 2):
            cp.start()

    own = yr[sl]                                     # [LS,256]
    left = yr[(sl - 1) % 4]                          # same sublane
    up = jnp.concatenate(                            # sublane shift +1
        [jnp.zeros((1, 256), jnp.int32), yr[(sl - 2) % 4][:-1]], axis=0)

    p = pr[d % 2]
    thr = lambda o: (p[:, o:o + 1], p[:, o + 1:o + 2], p[:, o + 2:o + 3],
                     p[:, o + 3:o + 4], p[:, o + 4:o + 5])

    # ---- luma vertical edges (transposed space) ----------------------
    T = _t16(own)                                    # lane 16x+py
    TL = _t16(left)
    for e in range(4):
        c = 4 * e
        al, be, t0, t1, t2 = thr(202 if e == 0 else 192)
        bs = p[:, 16 * e:16 * e + 16]                # [LS,16] per line
        if e == 0:
            psrc = TL
            pc = 12 * 16
        else:
            psrc = T
            pc = (c - 4) * 16
        p3 = psrc[:, pc:pc + 16]
        p2 = psrc[:, pc + 16:pc + 32]
        p1 = psrc[:, pc + 32:pc + 48]
        p0 = psrc[:, pc + 48:pc + 64]
        q0 = T[:, c * 16:c * 16 + 16]
        q1 = T[:, c * 16 + 16:c * 16 + 32]
        q2 = T[:, c * 16 + 32:c * 16 + 48]
        q3 = T[:, c * 16 + 48:c * 16 + 64]
        p2o, p1o, p0o, q0o, q1o, q2o = _luma_edge(
            p3, p2, p1, p0, q0, q1, q2, q3, bs, al, be, t0, t1, t2)
        if e == 0:
            TL = _set_lanes(TL, 13 * 16, p2o, p1o, p0o)
        else:
            T = _set_lanes(T, pc + 16, p2o, p1o, p0o)
        T = _set_lanes(T, c * 16, q0o, q1o, q2o)
    own = _t16(T)
    left = _t16(TL)

    # ---- luma horizontal edges (original space) ----------------------
    for e in range(4):
        r = 4 * e
        al, be, t0, t1, t2 = thr(197 if e == 0 else 192)
        bs = p[:, 64 + 16 * e:64 + 16 * e + 16]
        psrc = up if e == 0 else own
        prow = 12 * 16 if e == 0 else (r - 4) * 16
        p3 = psrc[:, prow:prow + 16]
        p2 = psrc[:, prow + 16:prow + 32]
        p1 = psrc[:, prow + 32:prow + 48]
        p0 = psrc[:, prow + 48:prow + 64]
        q0 = own[:, r * 16:r * 16 + 16]
        q1 = own[:, r * 16 + 16:r * 16 + 32]
        q2 = own[:, r * 16 + 32:r * 16 + 48]
        q3 = own[:, r * 16 + 48:r * 16 + 64]
        p2o, p1o, p0o, q0o, q1o, q2o = _luma_edge(
            p3, p2, p1, p0, q0, q1, q2, q3, bs, al, be, t0, t1, t2)
        if e == 0:
            up = _set_lanes(up, 13 * 16, p2o, p1o, p0o)
        else:
            own = _set_lanes(own, prow + 16, p2o, p1o, p0o)
        own = _set_lanes(own, r * 16, q0o, q1o, q2o)

    # ---- chroma (cb in lanes 0:64, cr in 64:128) ----------------------
    cown = cr_[sl]
    cleft = cr_[(sl - 1) % 4]
    cup = jnp.concatenate(
        [jnp.zeros((1, 128), jnp.int32), cr_[(sl - 2) % 4][:-1]], axis=0)

    TC = _t8(cown)
    TCL = _t8(cleft)
    for e, (col, cls_off) in enumerate(((0, 217), (4, 207))):
        al, be, t0, t1, t2 = thr(cls_off)
        bs = p[:, 128 + 16 * e:128 + 16 * e + 16]
        if e == 0:
            p1 = jnp.concatenate([TCL[:, 48:56], TCL[:, 112:120]], axis=1)
            p0 = jnp.concatenate([TCL[:, 56:64], TCL[:, 120:128]], axis=1)
        else:
            p1 = jnp.concatenate([TC[:, 16:24], TC[:, 80:88]], axis=1)
            p0 = jnp.concatenate([TC[:, 24:32], TC[:, 88:96]], axis=1)
        cc = col * 8
        q0 = jnp.concatenate([TC[:, cc:cc + 8],
                              TC[:, 64 + cc:64 + cc + 8]], axis=1)
        q1 = jnp.concatenate([TC[:, cc + 8:cc + 16],
                              TC[:, 64 + cc + 8:64 + cc + 16]], axis=1)
        p0o, q0o = _chroma_edge(p1, p0, q0, q1, bs, al, be, t0, t1, t2)
        if e == 0:
            TCL = _set_lanes(TCL, 56, p0o[:, 0:8])
            TCL = _set_lanes(TCL, 120, p0o[:, 8:16])
        else:
            TC = _set_lanes(TC, 24, p0o[:, 0:8])
            TC = _set_lanes(TC, 88, p0o[:, 8:16])
        TC = _set_lanes(TC, cc, q0o[:, 0:8])
        TC = _set_lanes(TC, 64 + cc, q0o[:, 8:16])
    cown = _t8(TC)
    cleft = _t8(TCL)

    for e, (row, cls_off) in enumerate(((0, 212), (4, 207))):
        al, be, t0, t1, t2 = thr(cls_off)
        bs = p[:, 160 + 16 * e:160 + 16 * e + 16]
        rr = row * 8
        if e == 0:
            p1 = jnp.concatenate([cup[:, 48:56], cup[:, 112:120]], axis=1)
            p0 = jnp.concatenate([cup[:, 56:64], cup[:, 120:128]], axis=1)
        else:
            p1 = jnp.concatenate([cown[:, 16:24], cown[:, 80:88]], axis=1)
            p0 = jnp.concatenate([cown[:, 24:32], cown[:, 88:96]], axis=1)
        q0 = jnp.concatenate([cown[:, rr:rr + 8],
                              cown[:, 64 + rr:64 + rr + 8]], axis=1)
        q1 = jnp.concatenate([cown[:, rr + 8:rr + 16],
                              cown[:, 64 + rr + 8:64 + rr + 16]], axis=1)
        p0o, q0o = _chroma_edge(p1, p0, q0, q1, bs, al, be, t0, t1, t2)
        if e == 0:
            cup = _set_lanes(cup, 56, p0o[:, 0:8])
            cup = _set_lanes(cup, 120, p0o[:, 8:16])
        else:
            cown = _set_lanes(cown, 24, p0o[:, 0:8])
            cown = _set_lanes(cown, 88, p0o[:, 8:16])
        cown = _set_lanes(cown, rr, q0o[:, 0:8])
        cown = _set_lanes(cown, 64 + rr, q0o[:, 8:16])

    # ---- write back rings + stream out final row d-2 -------------------
    yr[sl] = own
    cr_[sl] = cown
    yr[(sl - 1) % 4] = left
    cr_[(sl - 1) % 4] = cleft
    up_back = jnp.concatenate([up[1:], jnp.zeros((1, 256), jnp.int32)],
                              axis=0)
    cup_back = jnp.concatenate([cup[1:], jnp.zeros((1, 128), jnp.int32)],
                               axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (yr.shape[1], 1), 0)
    keep = lane == yr.shape[1] - 1
    yr[(sl - 2) % 4] = jnp.where(keep, yr[(sl - 2) % 4], up_back)
    cr_[(sl - 2) % 4] = jnp.where(keep, cr_[(sl - 2) % 4], cup_back)

    @pl.when(d >= 2)
    def _():
        for cp in out_copies(d - 2, d % 2):
            cp.start()

    @pl.when(d == S - 1)
    def _():
        # drain outstanding outs, then flush rows d-1 and d
        @pl.when((d >= 3) & (d + 1 >= S))
        def _():
            for cp in out_copies(d - 3, (d - 1) % 2):
                cp.wait()
        @pl.when(d >= 2)
        def _():
            for cp in out_copies(d - 2, d % 2):
                cp.wait()
        for k in (1, 0):
            @pl.when(d - k >= 0)
            def _():
                for cp in out_copies(d - k, (d - k) % 2):
                    cp.start()
                for cp in out_copies(d - k, (d - k) % 2):
                    cp.wait()


def deblock_params(arrs, w_mbs: int, h_mbs: int, chroma_qp_offset: int,
                   pk) -> jnp.ndarray:
    # h_mbs = batch * per-picture height when streams are stacked along
    # the diagonal axis (cross-picture edges are FT/FL-gated to bs=0)
    """Whole-picture bS + threshold precompute (plain XLA, raster in,
    packed [S, LS, 128] out) for the deblock kernel's P operand."""
    from . import deblock as K_db

    n = w_mbs * h_mbs
    tc4 = arrs["total_coeff"]
    mv = arrs["mv"]
    ref4 = arrs["ref_blk"]
    intra = ~arrs["is_inter"]
    en = arrs["enable"]
    bs_top, bs_left = K_db.boundary_strengths(
        tc4, mv, ref4[:, ::2, ::2], intra, arrs["FT"], arrs["FL"],
        w_mbs, h_mbs)
    bs_top = jnp.where(en[:, None, None], bs_top, 0)
    bs_left = jnp.where(en[:, None, None], bs_left, 0)

    qp = arrs["qp"]
    qg = qp.reshape(h_mbs, w_mbs)
    qp_a = jnp.concatenate([qg[:, :1], qg[:, :-1]], axis=1).reshape(n)
    qp_b = jnp.concatenate([qg[:1], qg[:-1]], axis=0).reshape(n)
    co = arrs["chroma_off_mb"]

    def classes(coff):
        t = K_db.edge_thresholds(qp, qp_a, qp_b, arrs["offA"],
                                 arrs["offB"], chroma_off=coff)
        cols = []
        for cls in ("inner", "top", "left"):
            alpha, beta, ia = t[cls]
            tc0 = K_db.TC0_J[ia]                       # [n,3]
            cols += [alpha[:, None], beta[:, None], tc0]
        return jnp.concatenate(cols, axis=1)           # [n,15]

    P = jnp.zeros((n, 256), jnp.int32)
    P = P.at[:, 0:64].set(
        jnp.repeat(bs_left.transpose(0, 2, 1), 4, axis=2).reshape(n, 64))
    P = P.at[:, 64:128].set(
        jnp.repeat(bs_top, 4, axis=2).reshape(n, 64))
    for e, col in enumerate((0, 2)):
        cv = jnp.repeat(bs_left[:, :, col], 2, axis=1)       # [n,8]
        P = P.at[:, 128 + 16 * e:128 + 16 * e + 8].set(cv)
        P = P.at[:, 128 + 16 * e + 8:128 + 16 * e + 16].set(cv)
    for e, row in enumerate((0, 2)):
        ch = jnp.repeat(bs_top[:, row, :], 2, axis=1)        # [n,8]
        P = P.at[:, 160 + 16 * e:160 + 16 * e + 8].set(ch)
        P = P.at[:, 160 + 16 * e + 8:160 + 16 * e + 16].set(ch)
    P = P.at[:, 192:207].set(classes(None))
    P = P.at[:, 207:222].set(classes(co))
    return pk(P)


@functools.partial(jax.jit, static_argnames=("interpret",))
def deblock_wavefront(Y, C, P, interpret: bool = False):
    """Y [S,LS,256] i32, C [S,LS,128] i32, P [S,LS,256] i32 ->
    filtered (Y', C'). interpret=True runs the kernel in the Pallas
    interpreter (CPU CI coverage of the kernel body)."""
    S, LS = Y.shape[0], Y.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(S,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((4, LS, 256), jnp.int32),
            pltpu.VMEM((4, LS, 128), jnp.int32),
            pltpu.VMEM((2, LS, 256), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        _db_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((S, LS, 256), jnp.int32),
                   jax.ShapeDtypeStruct((S, LS, 128), jnp.int32)],
        # multi-stream LANE batching grows the per-step working set
        # past the default 16 MB scoped-vmem budget (B=8 at 1080p
        # needs ~30 MB); raise the limit so wide batches compile
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(_MT16, jnp.bfloat16), jnp.asarray(_MT8, jnp.bfloat16),
      Y, C, P)


# ---------------------------------------------------------------------
# intra kernel
#
# P param lanes per MB (int32 [LS, 128]):
#   0 av_a, 1 av_b, 2 av_c, 3 av_d, 4 is_i4, 5 is_i16, 6 i16_mode,
#   7 chroma_mode, 8 is_intra_chroma, 9:25 i4 modes (z-order)
#
# Intra4x4 predictors: pred9 = (v @ W + RND) >> SHIFT where W[13,144]
# encodes every mode's <=3-tap combination (ops/tpu/intra tables) and
# v = [ul, up0..7, left0..3]; mode 2 (DC) patched separately.
# ---------------------------------------------------------------------

def _i4_weight_mat() -> np.ndarray:
    w = np.zeros((16, 256), np.float32)
    for m in range(9):
        for y in range(4):
            for x in range(4):
                for k in range(3):
                    i = K_in.IDX[m, y, x, k]
                    c = K_in.COEF[m, y, x, k]
                    if c:
                        w[i, m * 16 + y * 4 + x] += c
    return w


def _i4_rnd_shift():
    rnd = np.zeros((8, 256), np.int32)
    shf = np.zeros((8, 256), np.int32)
    for m in range(9):
        for y in range(4):
            for x in range(4):
                rnd[:, m * 16 + y * 4 + x] = K_in.RND[m, y, x]
                shf[:, m * 16 + y * 4 + x] = K_in.SHIFT[m, y, x]
    return rnd, shf


_W4 = _i4_weight_mat()
_RND4, _SHF4 = _i4_rnd_shift()
_MP16 = np.zeros((16, 128), np.float32)     # [y*4+x] -> [x*4+y]
for _y in range(4):
    for _x in range(4):
        _MP16[4 * _y + _x, 4 * _x + _y] = 1.0

# z-order block list as (bx, by)
_ZBLK = K_in.BLK_ORDER


def _bcast8(col):
    """[LS,1] -> [LS,8]."""
    return jnp.broadcast_to(col, (col.shape[0], 8))


def _intra_kernel(flags, M16, M8, MP16, W4, RND, SHF, Y, C, RY, RC, P,
                  Yo, Co, yr, cr_, ry, rc, pp, sems, osems):
    _t16 = lambda x: _tmul(x, M16[...])
    _t8 = lambda x: _tmul(x, M8[...])
    d = pl.program_id(0)
    LS = yr.shape[1]

    # flags[d] != 0 <=> some MB on diagonal d is intra (I4x4 or I16x16).
    # P-frame diagonals are usually intra-free; their rows only ride the
    # VMEM ring as neighbour context (and pass through unchanged), so
    # the whole prediction body — and its RY/RC/P loads — is skipped.
    # Selection semantics make this exact: newY/newC only differ from
    # own0/cown at intra MBs.
    #
    # Software pipeline (mirrors _db_kernel): row d's loads were issued
    # at step d-1 into the 8-deep ring; row d+1's are issued now; the
    # out-DMA of row d starts after compute and is waited only when its
    # ring slot is about to be reused (step d+7) or at the drain.
    S = pl.num_programs(0)

    def in_copies(row, par):
        return [pltpu.make_async_copy(Y.at[row], yr.at[row % 8],
                                      sems.at[par, 0]),
                pltpu.make_async_copy(C.at[row], cr_.at[row % 8],
                                      sems.at[par, 1])]

    def r_copies(row, par):
        return [pltpu.make_async_copy(RY.at[row], ry.at[row % 2],
                                      sems.at[par, 2]),
                pltpu.make_async_copy(RC.at[row], rc.at[row % 2],
                                      sems.at[par, 3]),
                pltpu.make_async_copy(P.at[row], pp.at[row % 2],
                                      sems.at[par, 4])]

    def out_copies(row, par):
        return [pltpu.make_async_copy(yr.at[row % 8], Yo.at[row],
                                      osems.at[par, 0]),
                pltpu.make_async_copy(cr_.at[row % 8], Co.at[row],
                                      osems.at[par, 1])]

    @pl.when(d == 0)
    def _():
        for cp in in_copies(0, 0):
            cp.start()
        @pl.when(flags[0] != 0)
        def _():
            for cp in r_copies(0, 0):
                cp.start()

    @pl.when(d + 1 < S)
    def _():
        # slot (d+1)%8 still holds row d-7; its out started at step d-7
        @pl.when(d >= 7)
        def _():
            for cp in out_copies(d - 7, (d - 7) % 8):
                cp.wait()
        for cp in in_copies(d + 1, (d + 1) % 2):
            cp.start()
        @pl.when(flags[d + 1] != 0)
        def _():
            for cp in r_copies(d + 1, (d + 1) % 2):
                cp.start()

    for cp in in_copies(d, d % 2):
        cp.wait()

    @pl.when(flags[d] == 1)
    def _compute_no_i4():
        for cp in r_copies(d, d % 2):
            cp.wait()
        _intra_compute(M16, M8, MP16, W4, RND, SHF, yr, cr_, ry, rc,
                       pp, d, d % 8, LS, _t16, _t8, with_i4=False)

    @pl.when(flags[d] >= 2)
    def _compute_full():
        for cp in r_copies(d, d % 2):
            cp.wait()
        _intra_compute(M16, M8, MP16, W4, RND, SHF, yr, cr_, ry, rc,
                       pp, d, d % 8, LS, _t16, _t8, with_i4=True)

    for cp in out_copies(d, d % 8):
        cp.start()

    @pl.when(d == S - 1)
    def _():
        for k in range(8):
            @pl.when(d - k >= 0)
            def _(k=k):
                for cp in out_copies(d - k, (d - k) % 8):
                    cp.wait()


def _intra_compute(M16, M8, MP16, W4, RND, SHF, yr, cr_, ry, rc, pp,
                   d, sl, LS, _t16, _t8, with_i4=True):
    p = pp[d % 2]
    av_a = p[:, 0:1]
    av_b = p[:, 1:2]
    av_c = p[:, 2:3]
    av_d = p[:, 3:4]
    is_i4 = p[:, 4:5]
    is_i16 = p[:, 5:6]

    own0 = yr[sl]
    res = ry[d % 2]

    def shift_up(a):
        return jnp.concatenate(
            [jnp.zeros((1, a.shape[1]), jnp.int32), a[:-1]], axis=0)

    A = yr[(sl - 1) % 8]
    Bm = shift_up(yr[(sl - 2) % 8])
    Cm = shift_up(yr[(sl - 1) % 8])
    Dm = shift_up(yr[(sl - 3) % 8])

    # cross-MB top context [LS,21]: [D(15,15) | B row15 | C row15 0:4]
    up_row = jnp.concatenate(
        [Dm[:, 255:256], Bm[:, 240:256], Cm[:, 240:244]], axis=1)
    lane_ix = jax.lax.broadcasted_iota(jnp.int32, (LS, 21), 1)
    up_row = jnp.where(av_b > 0, up_row,
                       jnp.where(lane_ix == 0, up_row, 0))
    up_row = _set_lanes(up_row, 0,
                        jnp.where(av_d > 0, up_row[:, 0:1], 0))
    TA = _t16(A)
    left_col = jnp.where(av_a > 0, TA[:, 240:256], 0)   # [LS,16]

    # ---- Intra4x4: z-order sequential blocks --------------------------
    # with_i4=False (flag value 1): no I4x4 MB on this diagonal — the
    # z-order chain and its transposes are skipped; X stays own0 and
    # the final is_i4 select never picks it.
    X = own0
    TX = _t16(own0) if with_i4 else None
    for z, (bx, by) in enumerate(_ZBLK if with_i4 else ()):
        mode = p[:, 9 + z:10 + z]
        # up pels [ul | up0..3 | ur0..3]
        if by == 0:
            ul = up_row[:, 4 * bx:4 * bx + 1]
            up4 = up_row[:, 4 * bx + 1:4 * bx + 5]
            if bx < 3:
                ur_raw = up_row[:, 4 * bx + 5:4 * bx + 9]
                ur_ok = av_b > 0
            else:
                ur_raw = up_row[:, 17:21]
                ur_ok = av_c > 0
            ur = jnp.where(ur_ok, ur_raw,
                           jnp.broadcast_to(up4[:, 3:4], up4.shape))
            au = av_b > 0
        else:
            urow = (4 * by - 1) * 16
            if bx == 0:
                ul = left_col[:, 4 * by - 1:4 * by]
            else:
                ul = X[:, urow + 4 * bx - 1:urow + 4 * bx]
            up4 = X[:, urow + 4 * bx:urow + 4 * bx + 4]
            code = K_in.NO_UPRIGHT
            if (bx, by) in code or bx == 3:
                ur = jnp.broadcast_to(up4[:, 3:4], up4.shape)
            else:
                ur = X[:, urow + 4 * bx + 4:urow + 4 * bx + 8]
            au = jnp.full((LS, 1), True)
        # left pels
        if bx == 0:
            left4 = left_col[:, 4 * by:4 * by + 4]
            al = av_a > 0
        else:
            lrow = (4 * bx - 1) * 16
            left4 = TX[:, lrow + 4 * by:lrow + 4 * by + 4]
            al = jnp.full((LS, 1), True)

        v = jnp.concatenate(
            [ul, up4, ur, left4, jnp.zeros((LS, 3), jnp.int32)], axis=1)
        lin = jax.lax.dot_general(
            v.astype(jnp.bfloat16), W4[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        pred9 = (lin + RND[0:1]) >> SHF[0:1]            # [LS,256]
        up_sum = up4[:, 0:1] + up4[:, 1:2] + up4[:, 2:3] + up4[:, 3:4]
        l_sum = (left4[:, 0:1] + left4[:, 1:2] + left4[:, 2:3]
                 + left4[:, 3:4])
        dc = jnp.where(au & al, (up_sum + l_sum + 4) >> 3,
                       jnp.where(au, (up_sum + 2) >> 2,
                                 jnp.where(al, (l_sum + 2) >> 2, 128)))
        sel = jnp.where(mode == 2,
                        jnp.broadcast_to(dc, (LS, 16)),
                        pred9[:, 0:16])
        for m in (0, 1, 3, 4, 5, 6, 7, 8):
            sel = jnp.where(mode == m, pred9[:, 16 * m:16 * m + 16], sel)
        rb = jnp.concatenate(
            [res[:, (4 * by + yy) * 16 + 4 * bx:
                 (4 * by + yy) * 16 + 4 * bx + 4] for yy in range(4)],
            axis=1)
        blk = jnp.clip(sel + rb, 0, 255)                # [LS,16] y*4+x
        blkT = _tmul(blk, MP16[...])[:, 0:16]           # x*4+y
        for yy in range(4):
            X = _set_lanes(X, (4 * by + yy) * 16 + 4 * bx,
                           blk[:, 4 * yy:4 * yy + 4])
            TX = _set_lanes(TX, (4 * bx + yy) * 16 + 4 * by,
                            blkT[:, 4 * yy:4 * yy + 4])

    # ---- Intra16x16 ----------------------------------------------------
    up16 = up_row[:, 1:17]
    ul16 = up_row[:, 0:1]
    vert = jnp.concatenate([up16] * 16, axis=1)
    hor = jnp.concatenate(
        [jnp.broadcast_to(left_col[:, k:k + 1], (LS, 16))
         for k in range(16)], axis=1)
    up_s = jnp.sum(up16, axis=1, keepdims=True)
    l_s = jnp.sum(left_col, axis=1, keepdims=True)
    dc16 = jnp.where((av_b > 0) & (av_a > 0), (up_s + l_s + 16) >> 5,
                     jnp.where(av_b > 0, (up_s + 8) >> 4,
                               jnp.where(av_a > 0, (l_s + 8) >> 4, 128)))
    dc16 = jnp.broadcast_to(dc16, (LS, 256))
    hsum = jnp.zeros((LS, 1), jnp.int32)
    vsum = jnp.zeros((LS, 1), jnp.int32)
    for xs in range(8):
        ue = ul16 if xs == 7 else up16[:, 6 - xs:7 - xs]
        le = ul16 if xs == 7 else left_col[:, 6 - xs:7 - xs]
        hsum = hsum + (xs + 1) * (up16[:, 8 + xs:9 + xs] - ue)
        vsum = vsum + (xs + 1) * (left_col[:, 8 + xs:9 + xs] - le)
    bb = (5 * hsum + 32) >> 6
    cc16 = (5 * vsum + 32) >> 6
    aa = 16 * (up16[:, 15:16] + left_col[:, 15:16])
    li = jax.lax.broadcasted_iota(jnp.int32, (LS, 256), 1)
    gx = li % 16
    gy = li // 16
    plane = jnp.clip((aa + bb * (gx - 7) + cc16 * (gy - 7) + 16) >> 5,
                     0, 255)
    m16 = p[:, 6:7]
    pred16 = jnp.where(m16 == 0, vert,
                       jnp.where(m16 == 1, hor,
                                 jnp.where(m16 == 2, dc16, plane)))
    i16out = jnp.clip(pred16 + res, 0, 255)

    newY = jnp.where(is_i4 > 0, X, jnp.where(is_i16 > 0, i16out, own0))

    # ---- chroma (cb lanes 0:64, cr 64:128) -----------------------------
    cown = cr_[sl]
    cres = rc[d % 2]
    Ac = cr_[(sl - 1) % 8]
    Bc = shift_up(cr_[(sl - 2) % 8])
    Dc = shift_up(cr_[(sl - 3) % 8])
    TAc = _t8(Ac)

    def cplane(off):
        upc = jnp.where(av_b > 0, Bc[:, off + 56:off + 64], 0)
        leftc = jnp.where(av_a > 0, TAc[:, off + 56:off + 64], 0)
        ulc = jnp.where(av_d > 0, Dc[:, off + 63:off + 64], 0)
        us0 = jnp.sum(upc[:, 0:4], axis=1, keepdims=True)
        us1 = jnp.sum(upc[:, 4:8], axis=1, keepdims=True)
        ls0 = jnp.sum(leftc[:, 0:4], axis=1, keepdims=True)
        ls1 = jnp.sum(leftc[:, 4:8], axis=1, keepdims=True)
        both = (av_b > 0) & (av_a > 0)
        aub = av_b > 0
        alf = av_a > 0

        def dcq(cx, cy):
            if (cx, cy) in ((0, 0), (1, 1)):
                b = (([us0, us1][cx] + [ls0, ls1][cy] + 4) >> 3)
            elif cx == 1:
                b = (us1 + 2) >> 2
            else:
                b = (ls1 + 2) >> 2
            u = ([us0, us1][cx] + 2) >> 2
            lv = ([ls0, ls1][cy] + 2) >> 2
            return jnp.where(both, b,
                             jnp.where(aub, u, jnp.where(alf, lv, 128)))

        li8 = jax.lax.broadcasted_iota(jnp.int32, (LS, 64), 1)
        px8 = li8 % 8
        py8 = li8 // 8
        dcp = jnp.zeros((LS, 64), jnp.int32)
        for cy in range(2):
            for cx in range(2):
                qm = (px8 // 4 == cx) & (py8 // 4 == cy)
                dcp = jnp.where(qm, jnp.broadcast_to(dcq(cx, cy),
                                                     (LS, 64)), dcp)
        horc = jnp.concatenate(
            [jnp.broadcast_to(leftc[:, k:k + 1], (LS, 8))
             for k in range(8)], axis=1)
        vertc = jnp.concatenate([upc] * 8, axis=1)
        hs = jnp.zeros((LS, 1), jnp.int32)
        vs = jnp.zeros((LS, 1), jnp.int32)
        for xs in range(4):
            ue = ulc if xs == 3 else upc[:, 2 - xs:3 - xs]
            le = ulc if xs == 3 else leftc[:, 2 - xs:3 - xs]
            hs = hs + (xs + 1) * (upc[:, 4 + xs:5 + xs] - ue)
            vs = vs + (xs + 1) * (leftc[:, 4 + xs:5 + xs] - le)
        bbc = (17 * hs + 16) >> 5
        ccc = (17 * vs + 16) >> 5
        aac = 16 * (upc[:, 7:8] + leftc[:, 7:8])
        planec = jnp.clip((aac + bbc * (px8 - 3) + ccc * (py8 - 3)
                           + 16) >> 5, 0, 255)
        cm = p[:, 7:8]
        predc = jnp.where(cm == 0, dcp,
                          jnp.where(cm == 1, horc,
                                    jnp.where(cm == 2, vertc, planec)))
        return jnp.clip(predc + cres[:, off:off + 64], 0, 255)

    outc = jnp.concatenate([cplane(0), cplane(64)], axis=1)
    is_ic = p[:, 8:9]
    newC = jnp.where(is_ic > 0, outc, cown)

    yr[sl] = newY
    cr_[sl] = newC


@functools.partial(jax.jit, static_argnames=("interpret",))
def intra_wavefront(Y, C, RY, RC, P, interpret: bool = False):
    """Y [S,LS,256], C [S,LS,128], RY [S,LS,256], RC [S,LS,128],
    P [S,LS,128] -> intra-reconstructed (Y', C').

    A per-diagonal scalar flag (any intra MB on the row) is prefetched
    so the kernel skips the whole prediction body on intra-free
    diagonals — the common case in P frames."""
    S, LS = Y.shape[0], Y.shape[1]
    # flags[d]: bit 0 = any intra MB on diagonal d (P lane 8), bit 1 =
    # any I4x4 MB (P lane 4) — value 1 runs the body without the
    # z-order chain, value 3 the full body
    flags = (jnp.max(P[:, :, 8], axis=1)
             + 2 * jnp.max(P[:, :, 4], axis=1)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((8, LS, 256), jnp.int32),
            pltpu.VMEM((8, LS, 128), jnp.int32),
            pltpu.VMEM((2, LS, 256), jnp.int32),
            pltpu.VMEM((2, LS, 128), jnp.int32),
            pltpu.VMEM((2, LS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 5)),
            pltpu.SemaphoreType.DMA((8, 2)),
        ],
    )
    return pl.pallas_call(
        _intra_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((S, LS, 256), jnp.int32),
                   jax.ShapeDtypeStruct((S, LS, 128), jnp.int32)],
        # see deblock_wavefront: wide LANE batches need >16 MB scoped
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flags,
      jnp.asarray(_MT16, jnp.bfloat16), jnp.asarray(_MT8, jnp.bfloat16),
      jnp.asarray(_MP16, jnp.bfloat16), jnp.asarray(_W4, jnp.bfloat16),
      jnp.asarray(_RND4), jnp.asarray(_SHF4), Y, C, RY, RC, P)


def intra_params(arrs, pk) -> jnp.ndarray:
    """Per-MB intra param lanes [S, LS, 128] (packed) for the kernel."""
    from ...bitstream.mb_layer import MB_I4x4, MB_I16x16
    cls = arrs["mb_class"]
    n = cls.shape[0]
    P = jnp.zeros((n, 128), jnp.int32)
    P = P.at[:, 0].set(arrs["av_a"].astype(jnp.int32))
    P = P.at[:, 1].set(arrs["av_b"].astype(jnp.int32))
    P = P.at[:, 2].set(arrs["av_c"].astype(jnp.int32))
    P = P.at[:, 3].set(arrs["av_d"].astype(jnp.int32))
    P = P.at[:, 4].set((cls == MB_I4x4).astype(jnp.int32))
    P = P.at[:, 5].set((cls == MB_I16x16).astype(jnp.int32))
    P = P.at[:, 6].set(arrs["i16_mode"])
    P = P.at[:, 7].set(arrs["chroma_mode"])
    P = P.at[:, 8].set(((cls == MB_I4x4) | (cls == MB_I16x16))
                       .astype(jnp.int32))
    zperm = jnp.asarray(np.array(
        [by * 4 + bx for bx, by in K_in.BLK_ORDER], np.int32))
    modes_z = jnp.take(arrs["i4_modes"].reshape(n, 16), zperm, axis=1)
    P = P.at[:, 9:25].set(modes_z)
    return pk(P)

"""Quarter-pel motion compensation as a Pallas TPU kernel.

The reference's MC kernel library (h264bsd_reconstruct.c: 15 fractional
luma positions over a 4x4 dispatch table :73/:1819, 6-tap (1,-5,20,20,-5,1)
half-pel filters :491-1817, 1/8-pel bilinear chroma :110-416, out-of-pic
edge extension h264bsdFillBlock :2222) exists in portable C plus ARM11 and
NEON assembly backends (SURVEY.md §2.4).  This module is the TPU backend:
one kernel, grid over macroblocks, that DMAs per-MB reference windows from
HBM into VMEM and evaluates the interpolation on the VPU + MXU.

Why not plain XLA: per-block reference windows are data-dependent gathers;
XLA lowers vmap(dynamic_slice) over 130k blocks to a scalar gather that
runs ~2 s/frame at 1080p.  Explicit DMA + MXU one-hot gathers bring that
to milliseconds.

Mosaic constraint that shapes the design: DMA offsets and in-VMEM dynamic
slices must be tile-aligned (8 sublanes / 128 lanes).  So all DMAs use
aligned "slabs", and the per-block sub-tile selection is done with two
exact one-hot matmuls on the MXU (pixel values <= 255 are exact in bf16;
a one-hot contraction moves one value per output, so results are exact):

  1. lane-gather:  T[r, 16b+j]   = slab[r, x0(b)+j]        (slab @ G)
  2. 6-tap/bilinear filter planes + the 16 fractional-position candidate
     planes as static lane/sublane rolls of T, in int32; per-lane case
     select (the per-block lumaFracPos dispatch)
  3. row-gather:   Out[16b+y, L] = Sel[y0(b)+2+y, L]        (R^T @ Sel)

Per-MB DMA modes (classified on host in `mc_tables`):
  mode 0/1: single ref slot, clipped block windows fit one 40x256 luma +
            24x256 chroma slab -> 2 DMAs.
  mode 2:   multi-ref or wide MV spread -> 16+16 per-block slab-lets into
            [24,4096]/[16,4096] buffers (lane offset 256*b), same compute.

Reference planes are stored edge-replicated with PAD pixels (the origin-
clip of a window into such a plane reproduces FillBlock's per-pixel clamp
exactly) and extended bottom/right so aligned slab DMAs stay in bounds.
Chroma cb/cr are interleaved on the lane axis (lane 2x = cb, 2x+1 = cr) so
one DMA + one bilinear evaluation serve both planes.

Bit-exactness oracle: ops/inter.py (NumPy, validated against the C
reference decoder); checked by tools/check_mc_pallas.py on TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 24          # edge-replication pad (>= 10x10 window => clamp-exact)
LSLAB_R = 40      # luma slab rows   (covers y-spread <= 23 after align-8)
CSLAB_R = 24      # chroma slab rows (covers y-spread <= 14 after align-8)
SLAB_L = 256      # slab lanes (covers x-spread <= 119 after align-128)
BSLAB_R = 24      # mode-2 per-block luma slab-let rows
MC_B = 4          # MBs processed per grid step (amortizes step cost)
BCSLAB_R = 16     # mode-2 per-block chroma slab-let rows

# host-side classification limits implied by the shapes above
_SPREAD_Y = LSLAB_R - 10 - 7
_SPREAD_X = SLAB_L - 10 - 127
_SPREAD_CY = CSLAB_R - 3 - 7
_SPREAD_CX = (SLAB_L - 6 - 127) // 2


def _ceil(a, m):
    return -(-a // m) * m


def luma_ext_dims(width: int, height: int):
    """Extended padded luma plane dims (rows, lanes)."""
    hp0, wp0 = height + 2 * PAD, width + 2 * PAD
    return _ceil(hp0, 8) + LSLAB_R, _ceil(wp0, 128) + SLAB_L


def chroma_ext_dims(width: int, height: int):
    """Extended interleaved chroma plane dims (rows, lanes)."""
    hc0 = height // 2 + 2 * PAD
    wc0 = width // 2 + 2 * PAD
    return _ceil(hc0, 8) + CSLAB_R, _ceil(2 * wc0, 128) + SLAB_L


def pad_luma(y: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> edge-replicated + DMA-extended [HpE, WpE] int32."""
    H, W = y.shape
    he, we = luma_ext_dims(W, H)
    return jnp.pad(y, ((PAD, he - H - PAD), (PAD, we - W - PAD)),
                   mode="edge").astype(jnp.int32)


def pad_chroma(cb: jnp.ndarray, cr: jnp.ndarray) -> jnp.ndarray:
    """[Hc, Wc] x2 -> interleaved edge-replicated [HcE, WcE] int32.

    lane 2*x = cb column x, lane 2*x+1 = cr column x (after PAD)."""
    Hc, Wc = cb.shape
    cbp = jnp.pad(cb, PAD, mode="edge")
    crp = jnp.pad(cr, PAD, mode="edge")
    il = jnp.stack([cbp, crp], axis=-1).reshape(Hc + 2 * PAD,
                                                2 * (Wc + 2 * PAD))
    he, we = chroma_ext_dims(2 * Wc, 2 * Hc)
    return jnp.pad(il, ((0, he - il.shape[0]), (0, we - il.shape[1])),
                   mode="edge").astype(jnp.int32)


def mc_tables(mv: np.ndarray, ref_blk: np.ndarray, width: int, height: int):
    """Classify MBs and pack the kernel's side tables.

    mv [nMB,4,4,2] int ((by,bx) block grid, (x,y) last), ref_blk [nMB,4,4].
    Returns dict: scal0..scal2 [nMB] i32, blkdata [nMB*1024] i32,
    blkvec [nMB,8,256] i32.
    """
    n = mv.shape[0]
    w_mbs = width // 16
    hp0, wp0 = height + 2 * PAD, width + 2 * PAD
    hc0, wc0 = height // 2 + 2 * PAD, width // 2 + 2 * PAD

    mb = np.arange(n, dtype=np.int32)
    px = (mb % w_mbs) * 16
    py = (mb // w_mbs) * 16
    bx = np.arange(4)[None, None, :]
    by = np.arange(4)[None, :, None]

    mvx = mv[..., 0].astype(np.int32)
    mvy = mv[..., 1].astype(np.int32)
    ref = np.maximum(ref_blk, 0).astype(np.int32)

    xi = px[:, None, None] + bx * 4 + (mvx >> 2)
    yi = py[:, None, None] + by * 4 + (mvy >> 2)
    x0 = np.clip(xi - 2 + PAD, 0, wp0 - 10)
    y0 = np.clip(yi - 2 + PAD, 0, hp0 - 10)
    case = (mvy & 3) * 4 + (mvx & 3)

    cxi = (px[:, None, None] // 2) + bx * 2 + (mvx >> 3)
    cyi = (py[:, None, None] // 2) + by * 2 + (mvy >> 3)
    cx0 = np.clip(cxi + PAD, 0, wc0 - 3)
    cy0 = np.clip(cyi + PAD, 0, hc0 - 3)
    cdx = mvx & 7
    cdy = mvy & 7

    flat = lambda a: a.reshape(n, 16)
    x0f, y0f, cx0f, cy0f = flat(x0), flat(y0), flat(cx0), flat(cy0)
    casef, cdxf, cdyf, reff = flat(case), flat(cdx), flat(cdy), flat(ref)
    mvxf, mvyf = flat(mvx), flat(mvy)

    uniform = ((mvxf == mvxf[:, :1]).all(1) & (mvyf == mvyf[:, :1]).all(1)
               & (reff == reff[:, :1]).all(1))
    # Mode 0's kernel path cuts ONE contiguous window using block 0's
    # offsets, which is only valid when every clipped block origin sits on
    # the regular +4/+2 grid.  np.clip saturation at picture edges (the
    # FillBlock case, h264bsd_reconstruct.c:2222) collapses origins onto
    # the bound, so any clipped MB must demote to mode 1 (per-block
    # origins); an unclipped uniform MB is automatically on the grid.
    unclipped = ((x0 == xi - 2 + PAD) & (y0 == yi - 2 + PAD)
                 & (cx0 == cxi + PAD)
                 & (cy0 == cyi + PAD)).reshape(n, 16).all(1)
    uniform = uniform & unclipped
    single_ref = (reff == reff[:, :1]).all(1)
    sy = y0f.max(1) - y0f.min(1)
    sx = x0f.max(1) - x0f.min(1)
    scy = cy0f.max(1) - cy0f.min(1)
    scx = cx0f.max(1) - cx0f.min(1)
    fits = (single_ref & (sy <= _SPREAD_Y) & (sx <= _SPREAD_X)
            & (scy <= _SPREAD_CY) & (scx <= _SPREAD_CX))
    mode = np.where(uniform, 0, np.where(fits, 1, 2)).astype(np.int32)

    ly0a = np.where(mode < 2, y0f.min(1), 0) & ~7
    lx0a = np.where(mode < 2, x0f.min(1), 0) & ~127
    cy0a = np.where(mode < 2, cy0f.min(1), 0) & ~7
    cx0a = np.where(mode < 2, (2 * cx0f).min(1), 0) & ~127

    scal0 = mode | (reff[:, 0] << 2)
    scal1 = ly0a | (lx0a << 12)
    scal2 = cy0a | (cx0a << 12)
    # uniform-MB (mode 0) scalars: window offsets inside the slab,
    # fractional case, chroma offsets/weights — the kernel's fast path
    # extracts by dynamic roll instead of one-hot matmuls
    u_dy = y0f[:, 0] - ly0a
    u_dx = x0f[:, 0] - lx0a
    u_cy = cy0f[:, 0] - cy0a
    u_cx = 2 * cx0f[:, 0] - cx0a
    scal3 = (u_dy | (u_dx << 3) | (casef[:, 0] << 10) | (u_cy << 14)
             | (u_cx << 17) | (cdxf[:, 0] << 24) | (cdyf[:, 0] << 27))
    scal3 = np.where(mode == 0, scal3, 0).astype(np.int32)

    # mode-2 per-block slab-let origins (packed scalar words)
    bly0a = y0f & ~7
    blx0a = x0f & ~127
    bcy0a = cy0f & ~7
    bcx0a = (2 * cx0f) & ~127
    w0 = ((bly0a >> 3) | ((blx0a >> 7) << 9) | ((bcy0a >> 3) << 15)
          | ((bcx0a >> 7) << 23))
    w1 = reff
    blk = np.zeros((n, 1024), np.int32)   # 1024 = HBM 1-D tile size
    blk[:, 0:32] = np.stack([w0, w1], axis=-1).reshape(n, 32)
    blkdata = blk.reshape(-1)

    # per-block relative offsets (vs shared slab or own slab-let)
    m2 = (mode == 2)[:, None]
    dyb = y0f - np.where(m2, bly0a, ly0a[:, None])
    dxb = x0f - np.where(m2, blx0a, lx0a[:, None])
    cyb = cy0f - np.where(m2, bcy0a, cy0a[:, None])
    cxb = 2 * cx0f - np.where(m2, bcx0a, cx0a[:, None])
    lane_off = np.where(m2, np.arange(16, dtype=np.int32)[None, :]
                        * SLAB_L, 0)

    jj = np.arange(16, dtype=np.int32)[None, None, :]
    blkvec = np.zeros((n, 8, 256), np.int32)
    # row 0: luma lane-gather target: slab lane of window col j
    blkvec[:, 0] = (lane_off[:, :, None] + dxb[:, :, None]
                    + jj).reshape(n, 256)
    # row 1: luma row-gather target: slab row of output row (jr)+2
    blkvec[:, 1] = (dyb[:, :, None] + 2 + jj).reshape(n, 256)
    # row 2: per-lane fractional case
    blkvec[:, 2] = np.repeat(casef, 16, axis=1)
    # row 3: chroma lane-gather target
    blkvec[:, 3] = (lane_off[:, :, None] + cxb[:, :, None]
                    + jj).reshape(n, 256)
    # row 4: chroma row-gather target
    blkvec[:, 4] = (cyb[:, :, None] + jj).reshape(n, 256)
    # rows 5/6: chroma bilinear weights per lane
    blkvec[:, 5] = np.repeat(cdxf, 16, axis=1)
    blkvec[:, 6] = np.repeat(cdyf, 16, axis=1)

    to32 = lambda a: a.astype(np.int32)
    return {"scal0": to32(scal0), "scal1": to32(scal1),
            "scal2": to32(scal2), "scal3": to32(scal3),
            "blkdata": to32(blkdata), "blkvec": to32(blkvec)}


def mc_tables_dev(mv, ref_blk, width: int, height: int,
                  mb0=0, n_ref: int = 0, batch: int = 1):
    """Device-side (jnp) twin of mc_tables — runs inside the jitted
    pipeline so no side tables cross the host boundary.

    mv [N,4,4,2] i32, ref_blk [N,4,4] i32 (N = batch * nMB or a band);
    mb0: global raster index of the first MB (bands; may be traced);
    n_ref: ref slots per stream (batch ref-index offsets); batch:
    streams stacked along the MB axis."""
    N = mv.shape[0]
    w_mbs = width // 16
    h_mbs = height // 16
    n_one = N // batch
    hp0, wp0 = height + 2 * PAD, width + 2 * PAD
    hc0, wc0 = height // 2 + 2 * PAD, width // 2 + 2 * PAD

    mb = mb0 + jnp.arange(N, dtype=jnp.int32) % n_one
    px = (mb % w_mbs) * 16
    py = (mb // w_mbs) * 16
    bx = jnp.arange(4, dtype=jnp.int32)[None, None, :]
    by = jnp.arange(4, dtype=jnp.int32)[None, :, None]

    mvx = mv[..., 0]
    mvy = mv[..., 1]
    soff = (jnp.arange(N, dtype=jnp.int32) // n_one) * n_ref
    ref = jnp.maximum(ref_blk, 0) + soff[:, None, None]

    xi = px[:, None, None] + bx * 4 + (mvx >> 2)
    yi = py[:, None, None] + by * 4 + (mvy >> 2)
    x0 = jnp.clip(xi - 2 + PAD, 0, wp0 - 10)
    y0 = jnp.clip(yi - 2 + PAD, 0, hp0 - 10)
    case = (mvy & 3) * 4 + (mvx & 3)

    cxi = (px[:, None, None] // 2) + bx * 2 + (mvx >> 3)
    cyi = (py[:, None, None] // 2) + by * 2 + (mvy >> 3)
    cx0 = jnp.clip(cxi + PAD, 0, wc0 - 3)
    cy0 = jnp.clip(cyi + PAD, 0, hc0 - 3)
    cdx = mvx & 7
    cdy = mvy & 7

    flat = lambda a: a.reshape(N, 16)
    x0f, y0f = flat(x0), flat(y0)
    cx0f, cy0f = flat(cx0), flat(cy0)
    casef, cdxf, cdyf, reff = flat(case), flat(cdx), flat(cdy), flat(ref)
    mvxf, mvyf = flat(mvx), flat(mvy)

    uniform = ((mvxf == mvxf[:, :1]).all(1) & (mvyf == mvyf[:, :1]).all(1)
               & (reff == reff[:, :1]).all(1))
    # clamped-window demotion — see mc_tables: mode 0 additionally
    # requires that NO window clip saturated (an unclipped uniform MB is
    # automatically on the +4/+2 grid; any saturation breaks it)
    unclipped = ((x0 == xi - 2 + PAD) & (y0 == yi - 2 + PAD)
                 & (cx0 == cxi + PAD)
                 & (cy0 == cyi + PAD)).reshape(N, 16).all(1)
    uniform = uniform & unclipped
    single_ref = (reff == reff[:, :1]).all(1)
    fits = (single_ref
            & (y0f.max(1) - y0f.min(1) <= _SPREAD_Y)
            & (x0f.max(1) - x0f.min(1) <= _SPREAD_X)
            & (cy0f.max(1) - cy0f.min(1) <= _SPREAD_CY)
            & (cx0f.max(1) - cx0f.min(1) <= _SPREAD_CX))
    mode = jnp.where(uniform, 0, jnp.where(fits, 1, 2))

    ly0a = jnp.where(mode < 2, y0f.min(1), 0) & ~7
    lx0a = jnp.where(mode < 2, x0f.min(1), 0) & ~127
    cy0a = jnp.where(mode < 2, cy0f.min(1), 0) & ~7
    cx0a = jnp.where(mode < 2, (2 * cx0f).min(1), 0) & ~127

    scal0 = mode | (reff[:, 0] << 2)
    scal1 = ly0a | (lx0a << 12)
    scal2 = cy0a | (cx0a << 12)
    u_dy = y0f[:, 0] - ly0a
    u_dx = x0f[:, 0] - lx0a
    u_cy = cy0f[:, 0] - cy0a
    u_cx = 2 * cx0f[:, 0] - cx0a
    scal3 = jnp.where(
        mode == 0,
        u_dy | (u_dx << 3) | (casef[:, 0] << 10) | (u_cy << 14)
        | (u_cx << 17) | (cdxf[:, 0] << 24) | (cdyf[:, 0] << 27), 0)

    bly0a = y0f & ~7
    blx0a = x0f & ~127
    bcy0a = cy0f & ~7
    bcx0a = (2 * cx0f) & ~127
    w0 = ((bly0a >> 3) | ((blx0a >> 7) << 9) | ((bcy0a >> 3) << 15)
          | ((bcx0a >> 7) << 23))
    w1 = reff
    blk = jnp.zeros((N, 1024), jnp.int32)
    blk = blk.at[:, 0:32].set(
        jnp.stack([w0, w1], axis=-1).reshape(N, 32))
    blkdata = blk.reshape(-1)

    m2 = (mode == 2)[:, None]
    dyb = y0f - jnp.where(m2, bly0a, ly0a[:, None])
    dxb = x0f - jnp.where(m2, blx0a, lx0a[:, None])
    cyb = cy0f - jnp.where(m2, bcy0a, cy0a[:, None])
    cxb = 2 * cx0f - jnp.where(m2, bcx0a, cx0a[:, None])
    lane_off = jnp.where(
        m2, jnp.arange(16, dtype=jnp.int32)[None, :] * SLAB_L, 0)

    jj = jnp.arange(16, dtype=jnp.int32)[None, None, :]
    rows = [
        (lane_off[:, :, None] + dxb[:, :, None] + jj).reshape(N, 256),
        (dyb[:, :, None] + 2 + jj).reshape(N, 256),
        jnp.repeat(casef, 16, axis=1),
        (lane_off[:, :, None] + cxb[:, :, None] + jj).reshape(N, 256),
        (cyb[:, :, None] + jj).reshape(N, 256),
        jnp.repeat(cdxf, 16, axis=1),
        jnp.repeat(cdyf, 16, axis=1),
        jnp.zeros((N, 256), jnp.int32),
    ]
    blkvec = jnp.stack(rows, axis=1)
    return {"scal0": scal0.astype(jnp.int32),
            "scal1": scal1.astype(jnp.int32),
            "scal2": scal2.astype(jnp.int32),
            "scal3": scal3.astype(jnp.int32),
            "blkdata": blkdata, "blkvec": blkvec}


def _clip8(a):
    return jnp.clip(a, 0, 255)


def _avg(a, b):
    return (a + b + 1) >> 1


def _roll(a, k, axis):
    """Roll with jnp semantics (out[i] = a[i-k]) for any sign of k."""
    return pltpu.roll(a, k % a.shape[axis], axis=axis)


def _rl(a, k):
    """Static lane roll: out[..., l] = a[..., l+k]."""
    return _roll(a, -k, 1)


def _rs(a, k):
    """Static sublane roll: out[..., r, :] = a[..., r+k, :]."""
    return _roll(a, -k, 0)


def _tap6_lanes(a):
    return (a - 5 * _rl(a, 1) + 20 * _rl(a, 2) + 20 * _rl(a, 3)
            - 5 * _rl(a, 4) + _rl(a, 5))


def _tap6_rows(a):
    return (a - 5 * _rs(a, 1) + 20 * _rs(a, 2) + 20 * _rs(a, 3)
            - 5 * _rs(a, 4) + _rs(a, 5))


def _onehot_cols(targets, rows, dtype=jnp.bfloat16):
    """G[r, l] = (r == targets[l]) — one-hot gather matrix."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 256), 0)
    return jnp.where(r == targets[None, :], 1, 0).astype(dtype)


def _mc_kernel(s0, s1, s2, s3, blkdata_hbm, vec, ref_y, ref_c,
               out_y, out_c,
               slab_y, slab_c, bslab_y, bslab_c, t1, t1c,
               blkrow, sem_s, sem_b, sem_bc, sem_r):
    m = pl.program_id(0)
    NM = pl.num_programs(0)          # grid steps (MC_B MBs each)

    # ---- slab DMAs, software-pipelined one STEP (MC_B MBs) ahead ------
    # processing MC_B MBs per grid step amortizes the fixed per-step
    # sequencing cost that dominated the 1-MB/step kernel (~1.3 us/MB
    # measured vs ~0.5 us of actual compute)
    def slab_copies(mm, par):
        w = s0[mm]
        rr = w >> 2
        la = pl.multiple_of(s1[mm] & 0xFFF, 8)
        lx = pl.multiple_of(s1[mm] >> 12, 128)
        ca = pl.multiple_of(s2[mm] & 0xFFF, 8)
        cx = pl.multiple_of(s2[mm] >> 12, 128)
        return [pltpu.make_async_copy(
                    ref_y.at[rr, pl.ds(la, LSLAB_R), pl.ds(lx, SLAB_L)],
                    slab_y.at[par], sem_s.at[par, 0]),
                pltpu.make_async_copy(
                    ref_c.at[rr, pl.ds(ca, CSLAB_R), pl.ds(cx, SLAB_L)],
                    slab_c.at[par], sem_s.at[par, 1])]

    def issue_step(step):
        for b in range(MC_B):
            mm = step * MC_B + b
            @pl.when((s0[mm] & 3) < 2)
            def _():
                for cp in slab_copies(mm, mm % (2 * MC_B)):
                    cp.start()

    @pl.when(m == 0)
    def _():
        issue_step(0)

    @pl.when(m + 1 < NM)
    def _():
        issue_step(m + 1)

    def one_mb(b):
        mm = m * MC_B + b
        w0 = s0[mm]
        mode = w0 & 3
        par = mm % (2 * MC_B)

        @pl.when(mode == 2)
        def _():
            cp = pltpu.make_async_copy(
                blkdata_hbm.at[pl.ds(mm * 1024, 1024)], blkrow, sem_r)
            cp.start()
            cp.wait()
            for k in range(16):
                wo = blkrow[2 * k]
                rb = blkrow[2 * k + 1]
                by0 = pl.multiple_of((wo & 0x1FF) * 8, 8)
                bx0 = pl.multiple_of(((wo >> 9) & 0x3F) * 128, 128)
                cby0 = pl.multiple_of(((wo >> 15) & 0xFF) * 8, 8)
                cbx0 = pl.multiple_of(((wo >> 23) & 0x3F) * 128, 128)
                pltpu.make_async_copy(
                    ref_y.at[rb, pl.ds(by0, BSLAB_R), pl.ds(bx0, SLAB_L)],
                    bslab_y.at[:, pl.ds(k * SLAB_L, SLAB_L)],
                    sem_b.at[k]).start()
                pltpu.make_async_copy(
                    ref_c.at[rb, pl.ds(cby0, BCSLAB_R),
                             pl.ds(cbx0, SLAB_L)],
                    bslab_c.at[:, pl.ds(k * SLAB_L, SLAB_L)],
                    sem_bc.at[k]).start()

        @pl.when(mode < 2)
        def _():
            for cp in slab_copies(mm, par):
                cp.wait()

        # ---- mode-0 fast path: uniform MV, no matmuls ----------------
        # 90% of realistic-content MBs are uniform (whole-MB MV/ref):
        # the 16x16 output is one contiguous window of the filtered
        # slab, so extraction is two dynamic rolls + one store, and
        # only the selected fractional-position plane is computed
        # (each case is a pl.when branch). The one-hot-matmul path
        # below (modes 1/2) costs ~1.2 us/MB, almost all of it in six
        # small MXU dots whose M dimension is 40.
        @pl.when(mode == 0)
        def _():
            w3 = s3[mm]
            dyb = w3 & 7
            dxb = (w3 >> 3) & 127
            case = (w3 >> 10) & 15
            cyb = (w3 >> 14) & 7
            cxb = (w3 >> 17) & 127
            cdx = (w3 >> 24) & 7
            cdy = (w3 >> 27) & 7
            slab = slab_y[par]

            def cut(plane, dy, dx):
                r = pltpu.roll(plane, (LSLAB_R - dy) % LSLAB_R, axis=0)
                r = pltpu.roll(r, (SLAB_L - dx) % SLAB_L, axis=1)
                return r[0:16, 0:16]

            def cand_case(k):
                # planes on raw slab coords; pixel (y, x) of the MB
                # window lives at slab (dyb+2+y, dxb+2+x); each case
                # branch computes ONLY the filter planes it references
                # (this laziness is most of the fast path's win: full-
                # pel and single-half cases skip 1-2 six-tap passes)
                g = slab
                if k == 0:
                    return cut(g, dyb + 2, dxb + 2)
                need_b = k in (1, 2, 3, 5, 6, 7, 13, 14, 15)
                need_h = k in (4, 5, 7, 8, 9, 11, 12, 13, 15)
                need_j = k in (6, 9, 10, 11, 14)
                bpl = hpl = jpl = None
                if need_b or need_j:
                    raw_h = _tap6_lanes(slab)
                if need_b:
                    bpl = _clip8((raw_h + 16) >> 5)
                if need_h:
                    hpl = _clip8((_tap6_rows(slab) + 16) >> 5)
                if need_j:
                    jpl = _clip8((_tap6_rows(raw_h) + 512) >> 10)
                # plane coords: b[r, c] = half-pel right of (r, c+2);
                # h[r, c] = half-pel below (r+2, c); j[r+2, c+2]
                if k == 1:
                    a1 = cut(g, dyb + 2, dxb + 2)
                    a2 = cut(bpl, dyb + 2, dxb)
                elif k == 2:
                    return cut(bpl, dyb + 2, dxb)
                elif k == 3:
                    a1 = cut(g, dyb + 2, dxb + 3)
                    a2 = cut(bpl, dyb + 2, dxb)
                elif k == 4:
                    a1 = cut(g, dyb + 2, dxb + 2)
                    a2 = cut(hpl, dyb, dxb + 2)
                elif k == 5:
                    a1 = cut(bpl, dyb + 2, dxb)
                    a2 = cut(hpl, dyb, dxb + 2)
                elif k == 6:
                    a1 = cut(jpl, dyb, dxb)
                    a2 = cut(bpl, dyb + 2, dxb)
                elif k == 7:
                    a1 = cut(bpl, dyb + 2, dxb)
                    a2 = cut(hpl, dyb, dxb + 3)
                elif k == 8:
                    return cut(hpl, dyb, dxb + 2)
                elif k == 9:
                    a1 = cut(jpl, dyb, dxb)
                    a2 = cut(hpl, dyb, dxb + 2)
                elif k == 10:
                    return cut(jpl, dyb, dxb)
                elif k == 11:
                    a1 = cut(jpl, dyb, dxb)
                    a2 = cut(hpl, dyb, dxb + 3)
                elif k == 12:
                    a1 = cut(g, dyb + 3, dxb + 2)
                    a2 = cut(hpl, dyb, dxb + 2)
                elif k == 13:
                    a1 = cut(bpl, dyb + 3, dxb)
                    a2 = cut(hpl, dyb, dxb + 2)
                elif k == 14:
                    a1 = cut(jpl, dyb, dxb)
                    a2 = cut(bpl, dyb + 3, dxb)
                else:
                    a1 = cut(bpl, dyb + 3, dxb)
                    a2 = cut(hpl, dyb, dxb + 3)
                return _avg(a1, a2)

            for k in range(16):
                @pl.when(case == k)
                def _(k=k):
                    out_y[b, :, :] = cand_case(k)

            cslab = slab_c[par]
            A = cslab
            Bc_ = _rl(cslab, 2)
            Cc_ = _rs(cslab, 1)
            Dc_ = _rl(Cc_, 2)
            pcu = ((8 - cdx) * (8 - cdy) * A + cdx * (8 - cdy) * Bc_
                   + (8 - cdx) * cdy * Cc_ + cdx * cdy * Dc_ + 32) >> 6
            rr = pltpu.roll(pcu, (CSLAB_R - cyb) % CSLAB_R, axis=0)
            rr = pltpu.roll(rr, (SLAB_L - cxb) % SLAB_L, axis=1)
            out_c[b, :, :] = rr[0:8, 0:16]

        # ---- modes 1/2: per-block windows via one-hot MXU gathers ----
        @pl.when(mode >= 1)
        def _():
            dxp = vec[b, 0, :]
            cxp = vec[b, 3, :]

            @pl.when(mode == 1)
            def _():
                G = _onehot_cols(dxp, SLAB_L)
                t1[...] = jnp.dot(slab_y[par].astype(jnp.bfloat16), G,
                                  preferred_element_type=jnp.float32)
                Gc = _onehot_cols(cxp, SLAB_L)
                t1c[...] = jnp.dot(slab_c[par].astype(jnp.bfloat16), Gc,
                                   preferred_element_type=jnp.float32)

            @pl.when(mode == 2)
            def _():
                for k in range(16):
                    pltpu.make_async_copy(
                        ref_y.at[0, pl.ds(0, BSLAB_R), pl.ds(0, SLAB_L)],
                        bslab_y.at[:, pl.ds(0, SLAB_L)], sem_b.at[k]).wait()
                    pltpu.make_async_copy(
                        ref_c.at[0, pl.ds(0, BCSLAB_R), pl.ds(0, SLAB_L)],
                        bslab_c.at[:, pl.ds(0, SLAB_L)], sem_bc.at[k]).wait()
                G2 = _onehot_cols(dxp, 16 * SLAB_L)
                t1[0:BSLAB_R] = jnp.dot(bslab_y[...].astype(jnp.bfloat16), G2,
                                        preferred_element_type=jnp.float32)
                Gc2 = _onehot_cols(cxp, 16 * SLAB_L)
                t1c[0:BCSLAB_R] = jnp.dot(
                    bslab_c[...].astype(jnp.bfloat16), Gc2,
                    preferred_element_type=jnp.float32)

            # ---- luma filter + candidate planes (int32, static rolls) ----
            T = t1[...].astype(jnp.int32)                   # [40,256]
            raw_h = _tap6_lanes(T)
            b_full = _clip8((raw_h + 16) >> 5)
            hh_full = _clip8((_tap6_rows(T) + 16) >> 5)
            jj_full = _clip8((_tap6_rows(raw_h) + 512) >> 10)
            # align planes so lane L=16k+2+x, row r=y0+2+y reads pixel (y,x)
            g = T
            bp = _roll(b_full, 2, 1)
            hp = _roll(hh_full, 2, 0)
            jp = _roll(_roll(jj_full, 2, 0), 2, 1)

            g01 = _rl(g, 1)
            g10 = _rs(g, 1)
            b1 = _rs(bp, 1)
            h1 = _rl(hp, 1)
            cands = [g, _avg(g, bp), bp, _avg(g01, bp),
                     _avg(g, hp), _avg(bp, hp), _avg(jp, bp), _avg(bp, h1),
                     hp, _avg(jp, hp), jp, _avg(jp, h1),
                     _avg(g10, hp), _avg(b1, hp), _avg(jp, b1),
                     _avg(b1, h1)]
            case_l = vec[b, 2, :][None, :]
            sel = cands[0]
            for k in range(1, 16):
                sel = jnp.where(case_l == k, cands[k], sel)

            # ---- luma row-gather (one-hot MXU) + write -------------------
            dyp = vec[b, 1, :]
            R = _onehot_cols(dyp, LSLAB_R)                  # [40,256]
            ext = jax.lax.dot_general(
                R, sel.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            for k in range(16):
                yy, xx = (k >> 2) * 4, (k & 3) * 4
                out_y[b, yy:yy + 4, xx:xx + 4] = ext[16 * k:16 * k + 4,
                                                     16 * k + 2:16 * k + 6]

            # ---- chroma bilinear + row-gather + write --------------------
            C1 = t1c[...].astype(jnp.int32)                 # [24,256]
            cdx = vec[b, 5, :][None, :]
            cdy = vec[b, 6, :][None, :]
            A = C1
            B = _rl(C1, 2)
            C = _rs(C1, 1)
            D = _rl(C, 2)
            pc = ((8 - cdx) * (8 - cdy) * A + cdx * (8 - cdy) * B
                  + (8 - cdx) * cdy * C + cdx * cdy * D + 32) >> 6
            cyp = vec[b, 4, :]
            Rc = _onehot_cols(cyp, CSLAB_R)
            extc = jax.lax.dot_general(
                Rc, pc.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            for k in range(16):
                yy, xx = (k >> 2) * 2, (k & 3) * 4
                out_c[b, yy:yy + 2, xx:xx + 4] = extc[16 * k:16 * k + 2,
                                                      16 * k:16 * k + 4]

    for b in range(MC_B):
        one_mb(b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mc_predict(ref_y: jnp.ndarray, ref_c: jnp.ndarray, tables,
               interpret: bool = False):
    """Run the MC kernel.

    ref_y [R, HyE, WyE] i32 (pad_luma), ref_c [R, HcE, WcE] i32
    (pad_chroma), tables from mc_tables (as device arrays).
    Returns pred_y [nMB,16,16] i32, pred_c [nMB,8,16] i32 (interleaved:
    lane 2k = cb, 2k+1 = cr). The MB count is padded to a multiple of
    MC_B internally (pad MBs are mode 0 at origin 0 — in-bounds reads,
    outputs dropped)."""
    n = tables["scal0"].shape[0]
    n4 = -(-n // MC_B) * MC_B
    pad = n4 - n
    s0 = jnp.pad(tables["scal0"], (0, pad))
    s1 = jnp.pad(tables["scal1"], (0, pad))
    s2 = jnp.pad(tables["scal2"], (0, pad))
    s3 = jnp.pad(tables["scal3"], (0, pad))
    blkdata = jnp.pad(tables["blkdata"], (0, pad * 1024))
    blkvec = jnp.pad(tables["blkvec"], ((0, pad), (0, 0), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n4 // MC_B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # blkdata
            pl.BlockSpec((MC_B, 8, 256), lambda m, *_: (m, 0, 0),
                         memory_space=pltpu.VMEM),   # blkvec
            pl.BlockSpec(memory_space=pl.ANY),       # ref_y
            pl.BlockSpec(memory_space=pl.ANY),       # ref_c
        ],
        out_specs=[
            pl.BlockSpec((MC_B, 16, 16), lambda m, *_: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MC_B, 8, 16), lambda m, *_: (m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * MC_B, LSLAB_R, SLAB_L), jnp.int32),
            pltpu.VMEM((2 * MC_B, CSLAB_R, SLAB_L), jnp.int32),
            pltpu.VMEM((BSLAB_R, 16 * SLAB_L), jnp.int32),
            pltpu.VMEM((BCSLAB_R, 16 * SLAB_L), jnp.int32),
            pltpu.VMEM((LSLAB_R, SLAB_L), jnp.float32),
            pltpu.VMEM((CSLAB_R, SLAB_L), jnp.float32),
            pltpu.SMEM((1024,), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * MC_B, 2)),
            pltpu.SemaphoreType.DMA((16,)),
            pltpu.SemaphoreType.DMA((16,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    py, pc = pl.pallas_call(
        _mc_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n4, 16, 16), jnp.int32),
                   jax.ShapeDtypeStruct((n4, 8, 16), jnp.int32)],
        interpret=interpret,
    )(s0, s1, s2, s3, blkdata, blkvec, ref_y, ref_c)
    return py[:n], pc[:n]

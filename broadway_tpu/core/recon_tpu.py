"""TPU pixel backend: whole-picture reconstruction as one jitted JAX
pipeline (compiled once per (resolution, dpb-size); SPS change retraces).

Stages (SURVEY.md §7 Stage B, re-designed TPU-first):
  1. residual: dequant+IDCT for every block, data-parallel  (ops/tpu/residual)
  2. inter:    quarter-pel MC for every 4x4 block, batched  (ops/tpu/inter)
  3. base assembly: inter + I_PCM MBs -> planes (reshapes, no scatter)
  4. intra:    lax.scan wavefront over x+2y anti-diagonals  (ops/tpu/intra)
  5. deblock:  vectorized bS/thresholds + lax.scan wavefront (ops/tpu/deblock)

Bit-exactness oracle: core/recon_cpu.py + core/deblock_impl.py (NumPy),
themselves validated against the reference C decoder.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..bitstream.mb_layer import (MB_I4x4, MB_I16x16, MB_IPCM, MB_P,
                                  PictureData)
from ..ops.tpu import deblock as K_db
from ..ops.tpu import inter as K_mc
from ..ops.tpu import intra as K_in
from ..ops.tpu import residual as K_res

PADF = 4  # frame padding used by the wavefront scans

# Debug escape hatch: run the wavefront scans as eager Python loops
# (no lax.scan tracing) — used by tests to iterate quickly.
EAGER_SCAN = False


def _scan(f, init, xs):
    if not EAGER_SCAN:
        return jax.lax.scan(f, init, xs)
    carry = init
    for i in range(xs.shape[0]):
        carry, _ = f(carry, xs[i])
    return carry, None

# (bx,by) -> up-right availability class for by>0 (static)
_UR_OK = np.ones((4, 4), bool)
for (_bx, _by) in K_in.NO_UPRIGHT:
    _UR_OK[_by, _bx] = False

# per-z-block static tables for the fori_loop body
_BX4 = np.array([bx * 4 for bx, by in K_in.BLK_ORDER], np.int32)
_BY4 = np.array([by * 4 for bx, by in K_in.BLK_ORDER], np.int32)
_Z_PERM = np.array([by * 4 + bx for bx, by in K_in.BLK_ORDER], np.int32)
# availability codes: 0 = use MB-level flag (av_b/av_a), 1 = av_c,
# 2 = always available, 3 = never
_AVU_CODE = np.array([0 if by == 0 else 2
                      for bx, by in K_in.BLK_ORDER], np.int32)
_AVL_CODE = np.array([0 if bx == 0 else 2
                      for bx, by in K_in.BLK_ORDER], np.int32)
_AVUR_CODE = np.array(
    [(0 if bx < 3 else 1) if by == 0 else (2 if _UR_OK[by, bx] else 3)
     for bx, by in K_in.BLK_ORDER], np.int32)

import jax.numpy as _jnp_static  # noqa: E402
_BX4_J = _jnp_static.asarray(_BX4)
_BY4_J = _jnp_static.asarray(_BY4)
_Z_PERM_J = _jnp_static.asarray(_Z_PERM)
_AVU_CODE_J = _jnp_static.asarray(_AVU_CODE)
_AVL_CODE_J = _jnp_static.asarray(_AVL_CODE)
_AVUR_CODE_J = _jnp_static.asarray(_AVUR_CODE)


def _diag_table(w_mbs: int, h_mbs: int) -> np.ndarray:
    """[n_steps, max_diag] MB addresses per x+2y anti-diagonal, -1 pad."""
    steps = (w_mbs - 1) + 2 * (h_mbs - 1) + 1
    diags = [[] for _ in range(steps)]
    for my in range(h_mbs):
        for mx in range(w_mbs):
            diags[mx + 2 * my].append(my * w_mbs + mx)
    m = max(len(d) for d in diags)
    out = np.full((steps, m), -1, np.int64)
    for i, d in enumerate(diags):
        out[i, :len(d)] = d
    return out


class TpuFrame:
    """Device-resident decoded picture (int32 planes + padded MC copies)."""

    __slots__ = ("y", "cb", "cr", "y_pad", "cb_pad", "cr_pad")

    def __init__(self, y, cb, cr, pad=True):
        self.y, self.cb, self.cr = y, cb, cr
        if pad:
            self.y_pad = K_mc.pad_plane(y)
            self.cb_pad = K_mc.pad_plane(cb)
            self.cr_pad = K_mc.pad_plane(cr)

    def tobytes(self) -> bytes:
        return (np.asarray(self.y).astype(np.uint8).tobytes() +
                np.asarray(self.cb).astype(np.uint8).tobytes() +
                np.asarray(self.cr).astype(np.uint8).tobytes())


def host_picture_arrays(pic: PictureData, chroma_qp_offset: int,
                        constrained_intra: bool) -> Dict[str, np.ndarray]:
    """Assemble the device tensor bundle for one picture (host, NumPy)."""
    n = pic.n_mbs
    w, h = pic.width_mbs, pic.height_mbs
    cls = pic.mb_class
    sid = pic.slice_id
    dec = pic.decoded

    grid = lambda a: a.reshape(h, w)
    decg, sidg = grid(dec), grid(sid)
    clsg = grid(cls)

    def nb_ok(dy, dx, constrained_block):
        # current MBs at (y, x), neighbour at (y+dy, x+dx)
        ok = np.zeros((h, w), bool)
        ys = slice(max(-dy, 0), h + min(-dy, 0))
        xs = slice(max(-dx, 0), w + min(-dx, 0))
        nys = slice(max(dy, 0), h + min(dy, 0))
        nxs = slice(max(dx, 0), w + min(dx, 0))
        valid = decg[nys, nxs] & (sidg[nys, nxs] == sidg[ys, xs])
        if constrained_block and constrained_intra:
            valid = valid & (clsg[nys, nxs] != MB_P)
        ok[ys, xs] = valid
        return ok.reshape(n)

    av_a = nb_ok(0, -1, True)
    av_b = nb_ok(-1, 0, True)
    av_c = nb_ok(-1, 1, True)
    av_d = nb_ok(-1, -1, True)

    # deblock enables
    idc = np.zeros(n, np.int32)
    offA = np.zeros(n, np.int32)
    offB = np.zeros(n, np.int32)
    for a in range(n):
        s = pic.slice_id[a]
        if s >= 0:
            sp = pic.slice_params[s]
            idc[a] = sp.disable_deblocking_idc
            offA[a] = sp.alpha_c0_offset
            offB[a] = sp.beta_offset
    enable = dec & (idc != 1)
    idcg = grid(idc)

    def db_nb(dy, dx):
        ok = np.zeros((h, w), bool)
        ys = slice(max(-dy, 0), h + min(-dy, 0))
        xs = slice(max(-dx, 0), w + min(-dx, 0))
        nys = slice(max(dy, 0), h + min(dy, 0))
        nxs = slice(max(dx, 0), w + min(dx, 0))
        ok[ys, xs] = decg[nys, nxs] & \
            ((idcg[ys, xs] != 2) | (sidg[nys, nxs] == sidg[ys, xs]))
        return ok.reshape(n)

    FT = enable & db_nb(-1, 0)
    FL = enable & db_nb(0, -1)

    # neighbour qp maps for thresholds
    qpg = grid(pic.qp)
    qp_a = np.zeros((h, w), np.int32)
    qp_a[:, 1:] = qpg[:, :-1]
    qp_b = np.zeros((h, w), np.int32)
    qp_b[1:, :] = qpg[:-1, :]

    ref_blk = np.repeat(np.repeat(pic.ref_slot, 2, axis=1), 2, axis=2)

    return {
        "mb_class": cls.astype(np.int32),
        "qp": pic.qp.astype(np.int32),
        "qp_a": qp_a.reshape(n),
        "qp_b": qp_b.reshape(n),
        "cbp": pic.cbp.astype(np.int32),
        "is_i16": (cls == MB_I16x16),
        "i16_mode": pic.i16_mode.astype(np.int32),
        "chroma_mode": pic.chroma_mode.astype(np.int32),
        "i4_modes": pic.i4_modes.astype(np.int32),
        "luma_coeffs": pic.luma_coeffs.astype(np.int32),
        "luma_dc": pic.luma_dc.astype(np.int32),
        "chroma_dc": pic.chroma_dc.astype(np.int32),
        "chroma_ac": pic.chroma_ac.reshape(n, 2, 2, 2, 16).astype(np.int32),
        "total_coeff": pic.total_coeff.astype(np.int32),
        "mv": pic.mv.astype(np.int32),
        "ref_blk": ref_blk.astype(np.int32),
        "ipcm": pic.ipcm,
        "av_a": av_a, "av_b": av_b, "av_c": av_c, "av_d": av_d,
        "idc": idc, "offA": offA, "offB": offB,
        "FT": FT, "FL": FL, "enable": enable,
        "is_inter": (cls == MB_P),
        "is_pcm": (cls == MB_IPCM),
        "decoded": dec,
    }


# ---------------------------------------------------------------------------
# jitted pipeline
# ---------------------------------------------------------------------------

def _mb_planes_to_image(mb_data: jnp.ndarray, h_mbs: int, w_mbs: int,
                        mb_size: int) -> jnp.ndarray:
    """[n, S, S] -> [h*S, w*S]."""
    return mb_data.reshape(h_mbs, w_mbs, mb_size, mb_size) \
        .transpose(0, 2, 1, 3).reshape(h_mbs * mb_size, w_mbs * mb_size)


def _image_to_mb_planes(img: jnp.ndarray, h_mbs: int, w_mbs: int,
                        mb_size: int) -> jnp.ndarray:
    return img.reshape(h_mbs, mb_size, w_mbs, mb_size) \
        .transpose(0, 2, 1, 3).reshape(h_mbs * w_mbs, mb_size, mb_size)


def decode_picture_impl(arrs: Dict[str, jnp.ndarray],
                   ref_y: jnp.ndarray, ref_cb: jnp.ndarray,
                   ref_cr: jnp.ndarray, diag: jnp.ndarray,
                   w_mbs: int, h_mbs: int, chroma_qp_offset: int):
    n = w_mbs * h_mbs
    H, W = h_mbs * 16, w_mbs * 16

    # ---- stage 1: residuals -------------------------------------------
    res_y, res_cb, res_cr = K_res.residual_planes(
        arrs["luma_coeffs"].reshape(n, 4, 4, 16), arrs["luma_dc"],
        arrs["chroma_dc"], arrs["chroma_ac"], arrs["qp"], arrs["cbp"],
        arrs["is_i16"], chroma_qp_offset, w_mbs, h_mbs)

    # ---- stage 2: inter MC --------------------------------------------
    mv = arrs["mv"]                                    # [n,4,4,2]
    ref_blk = jnp.maximum(arrs["ref_blk"], 0)          # [n,4,4]
    mb_ids = jnp.arange(n)
    mbx = (mb_ids % w_mbs)[:, None, None]
    mby = (mb_ids // w_mbs)[:, None, None]
    bx = jnp.arange(4)[None, None, :]
    by = jnp.arange(4)[None, :, None]
    px = jnp.broadcast_to(mbx * 16 + bx * 4, (n, 4, 4)).reshape(-1)
    py = jnp.broadcast_to(mby * 16 + by * 4, (n, 4, 4)).reshape(-1)
    mvx = mv[..., 0].reshape(-1)
    mvy = mv[..., 1].reshape(-1)
    ridx = ref_blk.reshape(-1)
    pred_y = K_mc.mc_luma_blocks(ref_y, ridx, px, py, mvx, mvy)
    pred_y = pred_y.reshape(n, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4) \
        .reshape(n, 16, 16)
    cpx = jnp.broadcast_to(mbx * 8 + bx * 2, (n, 4, 4)).reshape(-1)
    cpy = jnp.broadcast_to(mby * 8 + by * 2, (n, 4, 4)).reshape(-1)
    pred_cb = K_mc.mc_chroma_blocks(ref_cb, ridx, cpx, cpy, mvx, mvy)
    pred_cr = K_mc.mc_chroma_blocks(ref_cr, ridx, cpx, cpy, mvx, mvy)
    pred_cb = pred_cb.reshape(n, 4, 4, 2, 2).transpose(0, 1, 3, 2, 4) \
        .reshape(n, 8, 8)
    pred_cr = pred_cr.reshape(n, 4, 4, 2, 2).transpose(0, 1, 3, 2, 4) \
        .reshape(n, 8, 8)

    # ---- stage 3: base assembly ---------------------------------------
    res_y_mb = _image_to_mb_planes(res_y, h_mbs, w_mbs, 16)
    res_cb_mb = _image_to_mb_planes(res_cb, h_mbs, w_mbs, 8)
    res_cr_mb = _image_to_mb_planes(res_cr, h_mbs, w_mbs, 8)
    inter_y = jnp.clip(pred_y + res_y_mb, 0, 255)
    inter_cb = jnp.clip(pred_cb + res_cb_mb, 0, 255)
    inter_cr = jnp.clip(pred_cr + res_cr_mb, 0, 255)
    pcm = arrs["ipcm"].astype(jnp.int32)
    pcm_y = pcm[:, :256].reshape(n, 16, 16)
    pcm_cb = pcm[:, 256:320].reshape(n, 8, 8)
    pcm_cr = pcm[:, 320:384].reshape(n, 8, 8)
    is_p = arrs["is_inter"][:, None, None]
    is_pcm = arrs["is_pcm"][:, None, None]
    base_y = jnp.where(is_pcm, pcm_y, jnp.where(is_p, inter_y, 0))
    base_cb = jnp.where(is_pcm, pcm_cb, jnp.where(is_p, inter_cb, 0))
    base_cr = jnp.where(is_pcm, pcm_cr, jnp.where(is_p, inter_cr, 0))
    img_y = _mb_planes_to_image(base_y, h_mbs, w_mbs, 16)
    img_cb = _mb_planes_to_image(base_cb, h_mbs, w_mbs, 8)
    img_cr = _mb_planes_to_image(base_cr, h_mbs, w_mbs, 8)

    # ---- stage 4: intra wavefront -------------------------------------
    yP = jnp.pad(img_y, PADF)
    cbP = jnp.pad(img_cb, PADF)
    crP = jnp.pad(img_cr, PADF)

    M = diag.shape[1]
    cls = arrs["mb_class"]

    def intra_step(carry, addrs):
        yP, cbP, crP = carry
        valid = addrs >= 0
        a = jnp.maximum(addrs, 0)
        amx = a % w_mbs
        amy = a // w_mbs
        py0 = amy * 16 + PADF
        px0 = amx * 16 + PADF
        cy0 = amy * 8 + PADF
        cx0 = amx * 8 + PADF

        up_row = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
            yP, (yy, xx), (1, 21))[0])(py0 - 1, px0 - 1)      # [M,21]
        left_col = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
            yP, (yy, xx), (16, 1))[:, 0])(py0, px0 - 1)       # [M,16]
        cur = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
            yP, (yy, xx), (16, 16)))(py0, px0)                # [M,16,16]
        res_mb = jnp.take(res_y_mb, a, axis=0)

        av_a = jnp.take(arrs["av_a"], a)
        av_b = jnp.take(arrs["av_b"], a)
        av_c = jnp.take(arrs["av_c"], a)
        av_d = jnp.take(arrs["av_d"], a)

        # mask unavailable neighbour pels to 0 (legal modes never use them)
        up_row = jnp.where(av_b[:, None], up_row,
                           jnp.where(jnp.arange(21)[None] == 0,
                                     up_row, 0))
        up_row = up_row.at[:, 0].set(jnp.where(av_d, up_row[:, 0], 0))
        left_masked = jnp.where(av_a[:, None], left_col, 0)

        # --- I4x4: 16 z-order blocks via fori_loop on a local buffer ---
        # (single traced body: dynamic offsets per z keep compile small)
        loc = jnp.zeros((M, 17, 25), jnp.int32)
        loc = loc.at[:, 0, :21].set(up_row)
        loc = loc.at[:, 1:17, 0].set(left_masked)
        i4_modes = jnp.take(arrs["i4_modes"], a, axis=0)      # [M,4,4]
        i4_modes_z = i4_modes.reshape(M, 16)[:, _Z_PERM_J]    # [M,16] z order

        def blk_body(z, loc):
            bx4 = _BX4_J[z]
            by4 = _BY4_J[z]
            nb = jax.lax.dynamic_slice(loc, (0, by4, bx4), (M, 5, 9))
            ul = nb[:, 0, 0]
            up8 = nb[:, 0, 1:9]
            left4 = nb[:, 1:5, 0]
            # availability select per z (0: av_b / av_a, 1: av_c,
            # 2: always True, 3: always False)
            def sel(code):
                return jnp.where(code == 0, av_b,
                                 jnp.where(code == 1, av_c, code == 2))
            b_av_u = jnp.where(_AVU_CODE_J[z] == 0, av_b, True)
            b_av_ur = sel(_AVUR_CODE_J[z])
            b_av_l = jnp.where(_AVL_CODE_J[z] == 0, av_a, True)
            ur = jnp.where(b_av_ur[:, None], up8[:, 4:8], up8[:, 3:4])
            up8 = jnp.concatenate([up8[:, :4], ur], axis=1)
            v = jnp.concatenate([ul[:, None], up8, left4], axis=1)
            mode = i4_modes_z[:, z]
            pred = K_in.predict_i4x4_batch(v, mode, b_av_u, b_av_l)
            res_b = jax.lax.dynamic_slice(res_mb, (0, by4, bx4), (M, 4, 4))
            blk = jnp.clip(pred + res_b, 0, 255)
            return jax.lax.dynamic_update_slice(loc, blk,
                                                (0, by4 + 1, bx4 + 1))

        loc = jax.lax.fori_loop(0, 16, blk_body, loc)
        i4_out = loc[:, 1:17, 1:17]

        # --- I16x16 ------------------------------------------------------
        i16_mode = jnp.take(arrs["i16_mode"], a)
        up16 = up_row[:, 1:17]
        pred16 = K_in.predict_i16_batch(up16, left_masked, up_row[:, 0],
                                        i16_mode, av_b, av_a)
        i16_out = jnp.clip(pred16 + res_mb, 0, 255)

        mb_cls = jnp.take(cls, a)
        new_y = jnp.where((mb_cls == MB_I4x4)[:, None, None], i4_out,
                          jnp.where((mb_cls == MB_I16x16)[:, None, None],
                                    i16_out, cur))

        # --- chroma ------------------------------------------------------
        cmode = jnp.take(arrs["chroma_mode"], a)
        is_intra_c = (mb_cls == MB_I4x4) | (mb_cls == MB_I16x16)
        outs_c = []
        for plane, res_c in ((cbP, res_cb_mb), (crP, res_cr_mb)):
            uprow_c = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                plane, (yy, xx), (1, 9))[0])(cy0 - 1, cx0 - 1)
            left_c = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                plane, (yy, xx), (8, 1))[:, 0])(cy0, cx0 - 1)
            cur_c = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                plane, (yy, xx), (8, 8)))(cy0, cx0)
            upc = jnp.where(av_b[:, None], uprow_c[:, 1:9], 0)
            ulc = jnp.where(av_d, uprow_c[:, 0], 0)
            leftc = jnp.where(av_a[:, None], left_c, 0)
            predc = K_in.predict_chroma_batch(upc, leftc, ulc, cmode,
                                              av_b, av_a)
            resc = jnp.take(res_c, a, axis=0)
            outc = jnp.clip(predc + resc, 0, 255)
            outs_c.append(jnp.where(is_intra_c[:, None, None], outc, cur_c))

        # --- scatter back ----------------------------------------------
        def scatter(plane, vals, y0v, x0v, size):
            rows = y0v[:, None, None] + jnp.arange(size)[None, :, None]
            cols = x0v[:, None, None] + jnp.arange(size)[None, None, :]
            rows = jnp.where(valid[:, None, None], rows, plane.shape[0] + 1)
            return plane.at[rows, cols].set(vals, mode="drop")

        yP = scatter(yP, new_y, py0, px0, 16)
        cbP = scatter(cbP, outs_c[0], cy0, cx0, 8)
        crP = scatter(crP, outs_c[1], cy0, cx0, 8)
        return (yP, cbP, crP), None

    (yP, cbP, crP), _ = _scan(intra_step, (yP, cbP, crP), diag)

    # ---- stage 5: deblock ---------------------------------------------
    intra_mb = ~arrs["is_inter"]
    bs_top, bs_left = K_db.boundary_strengths(
        arrs["total_coeff"], arrs["mv"], arrs["ref_blk"][:, ::2, ::2],
        intra_mb, arrs["FT"], arrs["FL"], w_mbs, h_mbs)
    en = arrs["enable"][:, None, None]
    bs_top = jnp.where(en, bs_top, 0)
    bs_left = jnp.where(en, bs_left, 0)
    thr_l = K_db.edge_thresholds(arrs["qp"], arrs["qp_a"], arrs["qp_b"],
                                 arrs["offA"], arrs["offB"])
    thr_c = K_db.edge_thresholds(arrs["qp"], arrs["qp_a"], arrs["qp_b"],
                                 arrs["offA"], arrs["offB"],
                                 chroma_off=chroma_qp_offset)

    def db_step(carry, addrs):
        yP, cbP, crP = carry
        valid = addrs >= 0
        a = jnp.maximum(addrs, 0)
        amx = a % w_mbs
        amy = a // w_mbs
        wy0 = amy * 16  # window top in padded coords (py-4+PADF)
        wx0 = amx * 16
        win = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
            yP, (yy, xx), (20, 20)))(wy0, wx0)              # [M,20,20]

        bt = jnp.take(bs_top, a, axis=0)                    # [M,4,4]
        bl = jnp.take(bs_left, a, axis=0)

        def th(d, cls_):
            al, be, ia = d[cls_]
            return (jnp.take(al, a), jnp.take(be, a), jnp.take(ia, a))

        l_in, l_tp, l_lf = th(thr_l, "inner"), th(thr_l, "top"), \
            th(thr_l, "left")

        def pick_thr(thr_edge, thr_inner, k):
            return tuple(jnp.where(k == 0, e, i)
                         for e, i in zip(thr_edge, thr_inner))

        # vertical edges, columns k=0..3 at local col 4+4k (fori: one body)
        def v_body(k, win):
            c = 4 + 4 * k
            alpha, beta, ia = pick_thr(l_lf, l_in, k)
            bs4 = jax.lax.dynamic_index_in_dim(bl, k, axis=2,
                                               keepdims=False)  # [M,4]
            bs_col = jnp.repeat(bs4, 4, axis=1)                 # [M,16]
            cols = jax.lax.dynamic_slice(win, (0, 4, c - 4), (M, 16, 8))
            p3, p2, p1, p0 = (cols[..., 0], cols[..., 1], cols[..., 2],
                              cols[..., 3])
            q0, q1, q2, q3 = (cols[..., 4], cols[..., 5], cols[..., 6],
                              cols[..., 7])
            p2o, p1o, p0o, q0o, q1o, q2o = K_db.filter_lines_luma(
                p3, p2, p1, p0, q0, q1, q2, q3, bs_col,
                alpha[:, None], beta[:, None], ia[:, None])
            out = jnp.stack([p2o, p1o, p0o, q0o, q1o, q2o], axis=-1)
            return jax.lax.dynamic_update_slice(win, out, (0, 4, c - 3))

        win = jax.lax.fori_loop(0, 4, v_body, win)

        # horizontal edges, rows k=0..3 at local row 4+4k
        def h_body(k, win):
            r = 4 + 4 * k
            alpha, beta, ia = pick_thr(l_tp, l_in, k)
            bs4 = jax.lax.dynamic_index_in_dim(bt, k, axis=1,
                                               keepdims=False)  # [M,4]
            bs_row = jnp.repeat(bs4, 4, axis=1)                 # [M,16]
            rows = jax.lax.dynamic_slice(win, (0, r - 4, 4), (M, 8, 16))
            p3, p2, p1, p0 = (rows[:, 0], rows[:, 1], rows[:, 2],
                              rows[:, 3])
            q0, q1, q2, q3 = (rows[:, 4], rows[:, 5], rows[:, 6],
                              rows[:, 7])
            p2o, p1o, p0o, q0o, q1o, q2o = K_db.filter_lines_luma(
                p3, p2, p1, p0, q0, q1, q2, q3, bs_row,
                alpha[:, None], beta[:, None], ia[:, None])
            out = jnp.stack([p2o, p1o, p0o, q0o, q1o, q2o], axis=1)
            return jax.lax.dynamic_update_slice(win, out, (0, r - 3, 4))

        win = jax.lax.fori_loop(0, 4, h_body, win)

        def scatter(plane, vals, y0v, x0v, size):
            rows = y0v[:, None, None] + jnp.arange(size)[None, :, None]
            cols = x0v[:, None, None] + jnp.arange(size)[None, None, :]
            rows = jnp.where(valid[:, None, None], rows, plane.shape[0] + 1)
            return plane.at[rows, cols].set(vals, mode="drop")

        yP = scatter(yP, win, wy0, wx0, 20)

        # chroma
        c_in, c_tp, c_lf = th(thr_c, "inner"), th(thr_c, "top"), \
            th(thr_c, "left")
        cy0 = amy * 8
        cx0 = amx * 8
        new_planes = []
        for plane in (cbP, crP):
            cwin = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                plane, (yy, xx), (12, 12)))(cy0, cx0)       # [M,12,12]
            # vertical chroma edges at local cols 4 (left) and 8 (inner)
            for k, (cc, thr) in enumerate(((4, c_lf), (8, c_in))):
                alpha, beta, ia = thr
                # bs per chroma row: luma rows 0..3 -> bl col 0/2
                col = 0 if k == 0 else 2
                bs_rows = jnp.repeat(bl[:, :, col], 2, axis=1)  # [M,8]
                cols = cwin[:, 4:12, cc - 2:cc + 2]
                p1, p0 = cols[..., 0], cols[..., 1]
                q0, q1 = cols[..., 2], cols[..., 3]
                p0o, q0o = K_db.filter_lines_chroma(
                    p1, p0, q0, q1, bs_rows, alpha[:, None], beta[:, None],
                    ia[:, None])
                cwin = cwin.at[:, 4:12, cc - 1].set(p0o)
                cwin = cwin.at[:, 4:12, cc].set(q0o)
            for k, (rr, thr) in enumerate(((4, c_tp), (8, c_in))):
                alpha, beta, ia = thr
                row = 0 if k == 0 else 2
                bs_cols = jnp.repeat(bt[:, row, :], 2, axis=1)  # [M,8]
                rows = cwin[:, rr - 2:rr + 2, 4:12]
                p1, p0 = rows[:, 0], rows[:, 1]
                q0, q1 = rows[:, 2], rows[:, 3]
                p0o, q0o = K_db.filter_lines_chroma(
                    p1, p0, q0, q1, bs_cols, alpha[:, None], beta[:, None],
                    ia[:, None])
                cwin = cwin.at[:, rr - 1, 4:12].set(p0o)
                cwin = cwin.at[:, rr, 4:12].set(q0o)
            new_planes.append(scatter(plane, cwin, cy0, cx0, 12))
        return (yP, new_planes[0], new_planes[1]), None

    (yP, cbP, crP), _ = _scan(db_step, (yP, cbP, crP), diag)

    out_y = yP[PADF:PADF + H, PADF:PADF + W]
    out_cb = cbP[PADF:PADF + H // 2, PADF:PADF + W // 2]
    out_cr = crP[PADF:PADF + H // 2, PADF:PADF + W // 2]
    return out_y, out_cb, out_cr


decode_picture = functools.partial(
    jax.jit, static_argnames=("w_mbs", "h_mbs", "chroma_qp_offset"))(
        decode_picture_impl)

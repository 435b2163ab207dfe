"""Residual stage — batched dequant + inverse transforms in JAX (jit/TPU).

Twin of ops/transform.py (NumPy oracle); same bit-exact int32 semantics
(h264bsd_transform.c). Runs data-parallel over every block of the picture:
shapes are static per resolution, all MBs processed with masking — the XLA
way (no per-MB control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..transform import LEVEL_SCALE, QP_C, ZIGZAG_4x4, _POS_CLASS

_LS = jnp.asarray(LEVEL_SCALE)
_ZZ = jnp.asarray(ZIGZAG_4x4)
_PC = jnp.asarray(_POS_CLASS)
QP_C_J = jnp.asarray(QP_C)

# scatter index: raster[i] = scan[INV_ZZ[i]]
_INV_ZZ = np.zeros(16, np.int32)
for _s, _r in enumerate(ZIGZAG_4x4):
    _INV_ZZ[_r] = _s
_INV_ZZ_J = jnp.asarray(_INV_ZZ)


def dequant_idct(coeffs: jnp.ndarray, qp: jnp.ndarray,
                 dc: jnp.ndarray = None) -> jnp.ndarray:
    """coeffs [..., 16] int32 scan order; qp broadcastable to coeffs[...];
    dc optional [...] replaces position 0 after dequant. -> [..., 4, 4]."""
    qp_div = qp // 6
    scale = (_LS[qp % 6][..., _PC] << qp_div[..., None]).astype(jnp.int32)
    raster = jnp.take(coeffs, _INV_ZZ_J, axis=-1)
    d = raster * scale
    if dc is not None:
        d = d.at[..., 0].set(dc)
    d = d.reshape(*d.shape[:-1], 4, 4)
    t0 = d[..., :, 0] + d[..., :, 2]
    t1 = d[..., :, 0] - d[..., :, 2]
    t2 = (d[..., :, 1] >> 1) - d[..., :, 3]
    t3 = d[..., :, 1] + (d[..., :, 3] >> 1)
    h = jnp.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-1)
    t0 = h[..., 0, :] + h[..., 2, :]
    t1 = h[..., 0, :] - h[..., 2, :]
    t2 = (h[..., 1, :] >> 1) - h[..., 3, :]
    t3 = h[..., 1, :] + (h[..., 3, :] >> 1)
    out = jnp.stack([(t0 + t3 + 32) >> 6, (t1 + t2 + 32) >> 6,
                     (t1 - t2 + 32) >> 6, (t0 - t3 + 32) >> 6], axis=-2)
    return out.astype(jnp.int32)


def luma_dc_transform(dc_scan: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """[..., 16] scan order -> [..., 4, 4] per-block DC (raster)."""
    raster = jnp.take(dc_scan, _INV_ZZ_J, axis=-1)
    d = raster.reshape(*raster.shape[:-1], 4, 4)
    t0 = d[..., :, 0] + d[..., :, 2]
    t1 = d[..., :, 0] - d[..., :, 2]
    t2 = d[..., :, 1] - d[..., :, 3]
    t3 = d[..., :, 1] + d[..., :, 3]
    h = jnp.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-1)
    t0 = h[..., 0, :] + h[..., 2, :]
    t1 = h[..., 0, :] - h[..., 2, :]
    t2 = h[..., 1, :] - h[..., 3, :]
    t3 = h[..., 1, :] + h[..., 3, :]
    v = jnp.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-2)
    qp_div = qp // 6
    lev = _LS[qp % 6, 0]
    hi = v * (lev << jnp.maximum(qp_div - 2, 0))[..., None, None]
    rnd = jnp.where(qp_div == 1, 1, 2)[..., None, None]
    shift = jnp.maximum((2 - qp_div), 0)[..., None, None]
    lo = (v * lev[..., None, None] + rnd) >> shift
    return jnp.where((qp >= 12)[..., None, None], hi, lo).astype(jnp.int32)


def chroma_dc_transform(dcv: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] -> [..., 4] transformed chroma DC; qp is chroma QP."""
    a, b, c, d = dcv[..., 0], dcv[..., 1], dcv[..., 2], dcv[..., 3]
    t0, t1 = a + c, a - c
    t2, t3 = b - d, b + d
    v = jnp.stack([t0 + t3, t0 - t3, t1 + t2, t1 - t2], axis=-1)
    qp_div = qp // 6
    lev = _LS[qp % 6, 0]
    hi = v * (lev << jnp.maximum(qp_div - 1, 0))[..., None]
    lo = (v * lev[..., None]) >> 1
    return jnp.where((qp >= 6)[..., None], hi, lo).astype(jnp.int32)


def residual_planes(luma_coeffs, luma_dc, chroma_dc, chroma_ac, qp, cbp,
                    is_i16, chroma_qp_offset: int, w_mbs: int, h_mbs: int):
    """Build full-picture residual planes.

    luma_coeffs [n,4,4,16], luma_dc [n,16], chroma_dc [n,2,4],
    chroma_ac [n,2,2,2,16], qp [n], cbp [n], is_i16 [n] bool.
    Returns res_y [H,W], res_cb, res_cr [H/2,W/2] int32.
    """
    n = w_mbs * h_mbs
    dc = luma_dc_transform(luma_dc, qp)                    # [n,4,4]
    coeffs = luma_coeffs                                   # [n,by,bx,16]
    qp_b = qp[:, None, None]
    res_full = dequant_idct(coeffs, jnp.broadcast_to(qp_b, (n, 4, 4)))
    res_i16 = dequant_idct(coeffs, jnp.broadcast_to(qp_b, (n, 4, 4)),
                           dc=dc)
    # cbp gating for non-i16 blocks
    blk8 = (jnp.arange(4) // 2)[:, None] * 2 + (jnp.arange(4) // 2)[None, :]
    has = ((cbp[:, None, None] >> blk8[None]) & 1) != 0     # [n,4,4]
    res = jnp.where(is_i16[:, None, None, None, None],
                    res_i16,
                    jnp.where(has[..., None, None], res_full, 0))
    # assemble [n,4,4,4,4] -> [H, W]
    res_y = res.transpose(0, 1, 3, 2, 4).reshape(n, 16, 16)
    res_y = res_y.reshape(h_mbs, w_mbs, 16, 16).transpose(0, 2, 1, 3) \
        .reshape(h_mbs * 16, w_mbs * 16)

    qpc = QP_C_J[jnp.clip(qp + chroma_qp_offset, 0, 51)]
    cdc = chroma_dc_transform(chroma_dc, qpc[:, None])      # [n,2,4]
    cbp_c = cbp >> 4
    has_dc = (cbp_c > 0)[:, None, None, None]
    cdc = jnp.where(has_dc, cdc.reshape(n, 2, 2, 2), 0)
    qpc_b = jnp.broadcast_to(qpc[:, None, None, None], (n, 2, 2, 2))
    cres = dequant_idct(chroma_ac, qpc_b,
                        dc=cdc)                             # [n,2,2,2,4,4]
    has_ac = (cbp_c == 2)[:, None, None, None, None, None]
    has_any = (cbp_c > 0)[:, None, None, None, None, None]
    cres_dc_only = dequant_idct(jnp.zeros_like(chroma_ac), qpc_b, dc=cdc)
    cres = jnp.where(has_any, jnp.where(has_ac, cres, cres_dc_only), 0)
    planes = []
    for comp in range(2):
        p = cres[:, comp].transpose(0, 1, 3, 2, 4).reshape(n, 8, 8)
        p = p.reshape(h_mbs, w_mbs, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(h_mbs * 8, w_mbs * 8)
        planes.append(p)
    return res_y, planes[0], planes[1]

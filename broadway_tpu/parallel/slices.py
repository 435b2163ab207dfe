"""Slice-parallel decode: shard a picture's MB-row bands over a device
mesh — the TPU-native analogue of the reference's multi-worker sliceMode
(SURVEY.md §2.5 P2: each Web Worker decodes its own slices, then workers
ring-exchange decoded slice regions to rebuild full reference frames,
Player/Decoder.js:677-727 copySlice).

Here: each chip runs the full pixel pipeline on its band (the band's
slices are entropy- and prediction-independent by construction), then an
`all_gather` over the "sp" mesh axis rebuilds full reference frames on
every chip — the ICI-collective version of copySlice.

Exactness domain: streams whose slices align with the bands and use
disable_deblocking_filter_idc in {1, 2} (no filtering across slice
boundaries) — the same independence Broadway's sliceMode relies on.
Cross-slice deblocking (idc 0) needs a pipelined boundary pass (future).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import recon_tpu as RT
from ..bitstream.mb_layer import PictureData


def band_host_arrays(pic: PictureData, n_bands: int, chroma_qp_offset: int,
                     constrained_intra: bool) -> Dict[str, np.ndarray]:
    """Stacked per-band packed arrays [n_bands, S_band, LS, ...]."""
    h = pic.height_mbs
    assert h % n_bands == 0, "height_mbs must divide into equal bands"
    hb = h // n_bands
    per = [RT.host_picture_arrays(pic, chroma_qp_offset, constrained_intra,
                                  band=(b * hb, hb))
           for b in range(n_bands)]
    return {k: np.stack([p[k] for p in per]) for k in per[0]}


def decode_picture_sliced_impl(barrs, ref_y, ref_c, steps,
                               w_mbs, hb_mbs, chroma_qp_offset,
                               axis: str = "sp", mc: str = "xla",
                               h_mbs_full: int = None):
    """shard_map body: decode own band, all-gather to full planes."""
    band = jax.lax.axis_index(axis)
    y, cb, cr = RT.decode_picture_impl(
        jax.tree_util.tree_map(lambda x: x[0], barrs),
        ref_y, ref_c, steps,
        w_mbs=w_mbs, h_mbs=hb_mbs, chroma_qp_offset=chroma_qp_offset,
        mc=mc, mb0=band * hb_mbs * w_mbs, ref_h_mbs=h_mbs_full)
    # the ICI copySlice: every chip receives every band
    fy = jax.lax.all_gather(y, axis)        # [n_bands, Hb, W]
    fcb = jax.lax.all_gather(cb, axis)
    fcr = jax.lax.all_gather(cr, axis)
    H = fy.shape[0] * fy.shape[1]
    return (fy.reshape(H, -1), fcb.reshape(H // 2, -1),
            fcr.reshape(H // 2, -1))


def make_sliced_decoder(mesh: Mesh, w_mbs: int, h_mbs: int, n_bands: int,
                        chroma_qp_offset: int, axis: str = "sp"):
    """Returns jitted fn(banded_arrs, ref_y, ref_c, steps) ->
    full-frame planes (replicated)."""
    from jax import shard_map

    hb = h_mbs // n_bands

    fn = functools.partial(decode_picture_sliced_impl, w_mbs=w_mbs,
                           hb_mbs=hb, chroma_qp_offset=chroma_qp_offset,
                           axis=axis, h_mbs_full=h_mbs,
                           mc=RT.default_mc_backend(
                               mesh.devices.flat[0]))
    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(sharded)


def decode_stream_sliced(data: bytes, mesh: Mesh, n_bands: int,
                         backend_decoder=None) -> List[bytes]:
    """End-to-end band-sharded decode of an Annex-B stream on `mesh`.
    Returns display-order YUV bytes. Host front-end parses; the pixel
    pipeline runs sharded via the decoder's recon_strategy hook; DPB
    frames stay replicated device arrays. Pictures with errors fall
    back to the built-in concealment path automatically."""
    import broadway_tpu.core.decoder as DEC

    decoder_fn = {}

    def sliced_recon(self, pic):
        sps, pps = self.sps, self.pps
        w, h = sps.width_mbs, sps.height_mbs
        key = (w, h)
        if key not in decoder_fn:
            decoder_fn[key] = make_sliced_decoder(
                mesh, w, h, n_bands, pps.chroma_qp_index_offset)
        barrs = band_host_arrays(pic, n_bands, pps.chroma_qp_index_offset,
                                 pps.constrained_intra_pred)
        barrs = {k: jnp.asarray(v) for k, v in barrs.items()}
        steps = {k: jnp.asarray(v)
                 for k, v in RT.step_tables(w, h // n_bands).items()}
        ref_y, ref_c = RT.ref_stacks(self.dpb.buffer, sps.width,
                                     sps.height)
        y, cb, cr = decoder_fn[key](barrs, ref_y, ref_c, steps)
        return RT.TpuFrame(y, cb, cr)

    dec = DEC.Decoder(backend="cpu", recon_strategy=sliced_recon)
    outs = dec.decode_annexb(data)
    return [o.frame.tobytes() for o in outs]

"""Shared helpers for bench.py and __graft_entry__.py: generate/cache a
bench stream, parse it to device tensor bundles."""

from __future__ import annotations

import os
import pickle
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def bench_stream(width_mbs, height_mbs, n_frames=4, seed=909):
    """Generate (and cache) an inter stream at the given size."""
    cache = os.path.join(REPO, "build",
                         f"bench_{width_mbs}x{height_mbs}_{n_frames}.h264")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return f.read()
    import streams
    data, _ = streams.inter_stream(
        width_mbs=width_mbs, height_mbs=height_mbs, n_frames=n_frames,
        seed=seed, deblock=True, mvd_range=40)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    with open(cache, "wb") as f:
        f.write(data)
    return data


def parse_pictures(data, max_pics=None):
    """Run the host front-end; returns list of
    (host_arrays, w_mbs, h_mbs, chroma_qp_offset, n_ref_slots)."""
    import broadway_tpu.core.decoder as DEC
    from broadway_tpu.core.recon_tpu import host_picture_arrays

    out = []
    orig = DEC.Decoder._finish_picture

    def patched(self, concealed):
        arrs = host_picture_arrays(self.pic,
                                   self.pps.chroma_qp_index_offset,
                                   self.pps.constrained_intra_pred)
        out.append((arrs, self.sps.width_mbs, self.sps.height_mbs,
                    self.pps.chroma_qp_index_offset,
                    len(self.dpb.buffer)))
        return orig(self, concealed)

    DEC.Decoder._finish_picture = patched
    try:
        d = DEC.Decoder(backend="cpu")
        d.decode_annexb(data)
    finally:
        DEC.Decoder._finish_picture = orig
    if max_pics:
        out = out[:max_pics]
    return out

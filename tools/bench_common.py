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


def realistic_bench_stream(width_mbs=120, height_mbs=68, n_frames=16,
                           n_slices=8, seed=4242):
    """Generate (and cache) the realistic-statistics bench stream:
    multi-slice, idc 0, multi-ref, mostly-skip with sparse residuals
    (tools/streams.realistic_stream).  Generation is pure-Python and
    costs ~20 s/stream at 1080p, so every (size, frames, seed) variant
    is disk-cached — the driver's timed bench run must never pay it."""
    sfx = "" if seed == 4242 else f"_s{seed}"
    cache = os.path.join(
        REPO, "build",
        f"bench_real_{width_mbs}x{height_mbs}_{n_frames}{sfx}.h264")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return f.read()
    import streams
    data, _ = streams.realistic_stream(
        width_mbs=width_mbs, height_mbs=height_mbs, n_frames=n_frames,
        n_slices=n_slices, seed=seed)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    with open(cache, "wb") as f:
        f.write(data)
    return data


def parse_pictures(data, max_pics=None):
    """Run the host front-end; returns list of
    (host_arrays, w_mbs, h_mbs, chroma_qp_offset, n_ref_slots).
    Uses the decoder's recon_strategy hook — no pixel reconstruction
    runs; DPB/POC bookkeeping proceeds normally (frames stay None)."""
    import broadway_tpu.core.decoder as DEC
    from broadway_tpu.core.recon_tpu import host_picture_arrays

    out = []

    def collect(dec, pic):
        arrs = host_picture_arrays(pic,
                                   dec.pps.chroma_qp_index_offset,
                                   dec.pps.constrained_intra_pred)
        out.append((arrs, dec.sps.width_mbs, dec.sps.height_mbs,
                    dec.pps.chroma_qp_index_offset,
                    len(dec.dpb.buffer)))
        return DEC.SKIP_RECON

    d = DEC.Decoder(backend="cpu", recon_strategy=collect)
    d.decode_annexb(data)
    if max_pics:
        out = out[:max_pics]
    return out

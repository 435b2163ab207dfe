"""Golden tests: error concealment vs the reference on corrupted streams
(dropped slice NALs, truncated slice data)."""

import random

import streams
from broadway_tpu.bitstream import bitreader as br
from test_golden_intra import golden_compare


def drop_nals(data, drop_indices):
    """Remove whole NAL units by index."""
    nals = list(br.split_nal_units(data))
    out = bytearray()
    for i, (off, payload) in enumerate(nals):
        if i in drop_indices:
            continue
        out += b"\x00\x00\x00\x01" + payload
    return bytes(out)


def truncate_nal(data, index, keep_frac=0.6):
    nals = list(br.split_nal_units(data))
    out = bytearray()
    for i, (off, payload) in enumerate(nals):
        if i == index:
            payload = payload[:max(4, int(len(payload) * keep_frac))]
        out += b"\x00\x00\x00\x01" + payload
    return bytes(out)


def test_conceal_missing_slice_multislice(oracle_dectest, tmp_path):
    # picture 2 of a 3-slice stream loses its middle slice
    data, _ = streams.multislice_stream(n_frames=3, seed=931, n_slices=3,
                                        deblock_idc=0, vary_slice_qp=False)
    # NALs: SPS, PPS, then 3 slices per frame
    data = drop_nals(data, {2 + 3 + 1})   # middle slice of frame 2
    golden_compare(tmp_path, oracle_dectest, data, "cmiss")


def test_conceal_truncated_slice_I(oracle_dectest, tmp_path):
    data, _ = streams.intra_mixed_stream(n_frames=3, seed=932, deblock=True)
    data = truncate_nal(data, 3, 0.5)     # second picture's slice
    golden_compare(tmp_path, oracle_dectest, data, "ctruncI")


def test_conceal_truncated_slice_P(oracle_dectest, tmp_path):
    data, _ = streams.inter_stream(n_frames=5, seed=933, deblock=True)
    data = truncate_nal(data, 4, 0.4)     # a P picture's slice
    golden_compare(tmp_path, oracle_dectest, data, "ctruncP")


def test_conceal_whole_picture_P(oracle_dectest, tmp_path):
    data, _ = streams.inter_stream(n_frames=5, seed=934, deblock=True)
    data = drop_nals(data, {4})           # whole P picture missing -> next
    golden_compare(tmp_path, oracle_dectest, data, "cwhole")

"""Golden tests: POC types, non-ref pictures, mid-stream IDR, frame_num
wrap, MMCO, cropping."""

import pytest

import streams
from test_golden_intra import golden_compare


@pytest.mark.parametrize("poc_type", [0, 1, 2])
def test_poc_types(oracle_dectest, tmp_path, poc_type):
    data, _ = streams.poc_reorder_stream(poc_type=poc_type,
                                         seed=410 + poc_type)
    golden_compare(tmp_path, oracle_dectest, data, f"poc{poc_type}")


def test_non_ref_frames(oracle_dectest, tmp_path):
    data, _ = streams.poc_reorder_stream(poc_type=0, seed=420,
                                         non_ref_every=2, gop_len=7)
    golden_compare(tmp_path, oracle_dectest, data, "nonref")


def test_frame_num_wrap(oracle_dectest, tmp_path):
    data, _ = streams.poc_reorder_stream(poc_type=0, seed=421,
                                         log2_max_frame_num=4,
                                         log2_max_poc_lsb=4,
                                         gop_len=24, n_gops=1)
    golden_compare(tmp_path, oracle_dectest, data, "fnwrap")


def test_mmco1(oracle_dectest, tmp_path):
    data, _ = streams.poc_reorder_stream(poc_type=0, seed=422,
                                         mmco_forget=True, gop_len=8,
                                         num_ref_frames=3)
    golden_compare(tmp_path, oracle_dectest, data, "mmco1")


def test_cropping(oracle_dectest, tmp_path):
    import os
    from conftest import run_oracle
    from broadway_tpu.core.decoder import Decoder

    data, info = streams.cropped_stream()
    sp = os.path.join(str(tmp_path), "crop.h264")
    op = os.path.join(str(tmp_path), "crop.yuv")
    with open(sp, "wb") as f:
        f.write(data)
    golden, log = run_oracle(oracle_dectest, sp, op, extra_args=("-C",))

    outs = Decoder().decode_annexb(data)
    chunks = []
    for o in outs:
        l, r, t, b = o.crop
        y = o.frame.y[t:o.height - b, l:o.width - r]
        cb = o.frame.cb[t // 2:(o.height - b) // 2, l // 2:(o.width - r) // 2]
        cr = o.frame.cr[t // 2:(o.height - b) // 2, l // 2:(o.width - r) // 2]
        chunks.append(y.tobytes() + cb.tobytes() + cr.tobytes())
    mine = b"".join(chunks)
    assert mine == golden, (len(mine), len(golden))

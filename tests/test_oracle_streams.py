"""Sanity: generated streams decode cleanly in the reference decoder and
produce the expected number/size of golden YUV frames."""

import os

import streams
from conftest import run_oracle


def _decode(tmp_path, dectest, data, name):
    sp = os.path.join(str(tmp_path), name + ".h264")
    op = os.path.join(str(tmp_path), name + ".yuv")
    with open(sp, "wb") as f:
        f.write(data)
    return run_oracle(dectest, sp, op)


def test_ipcm_stream(oracle_dectest, tmp_path):
    data, info = streams.ipcm_stream()
    yuv, log = _decode(tmp_path, oracle_dectest, data, "ipcm")
    frame_size = info["width"] * info["height"] * 3 // 2
    assert len(yuv) == frame_size * info["n_frames"], log
    assert "ERROR" not in log


def test_i4x4_flat_stream(oracle_dectest, tmp_path):
    data, info = streams.i4x4_flat_stream()
    yuv, log = _decode(tmp_path, oracle_dectest, data, "i4")
    frame_size = info["width"] * info["height"] * 3 // 2
    assert len(yuv) == frame_size * info["n_frames"], log

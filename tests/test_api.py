"""API layer: H264Decoder mirrors the reference instance API; the CLI
testbench produces byte-identical output to the reference DecTestBench."""

import os
import subprocess
import sys

import streams
from conftest import REPO, run_oracle


def _run_cli(tmp_path, data, name, args=()):
    sp = os.path.join(str(tmp_path), name + ".h264")
    op = os.path.join(str(tmp_path), name + "_mine.yuv")
    with open(sp, "wb") as f:
        f.write(data)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dectest.py"),
         f"-O{op}", *args, sp],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    with open(op, "rb") as f:
        return f.read()


def test_cli_matches_oracle(oracle_dectest, tmp_path):
    data, _ = streams.inter_stream(n_frames=4, seed=901, deblock=True)
    sp = os.path.join(str(tmp_path), "a.h264")
    op = os.path.join(str(tmp_path), "a.yuv")
    with open(sp, "wb") as f:
        f.write(data)
    golden, _ = run_oracle(oracle_dectest, sp, op)
    assert _run_cli(tmp_path, data, "a") == golden


def test_cli_packet_mode(oracle_dectest, tmp_path):
    data, _ = streams.inter_stream(n_frames=3, seed=902, deblock=True)
    sp = os.path.join(str(tmp_path), "b.h264")
    op = os.path.join(str(tmp_path), "b.yuv")
    with open(sp, "wb") as f:
        f.write(data)
    golden, _ = run_oracle(oracle_dectest, sp, op, extra_args=("-P",))
    assert _run_cli(tmp_path, data, "b", ("-P",)) == golden


def test_cli_nal_mode(oracle_dectest, tmp_path):
    data, _ = streams.intra_mixed_stream(seed=903, deblock=True)
    sp = os.path.join(str(tmp_path), "c.h264")
    op = os.path.join(str(tmp_path), "c.yuv")
    with open(sp, "wb") as f:
        f.write(data)
    golden, _ = run_oracle(oracle_dectest, sp, op, extra_args=("-U",))
    assert _run_cli(tmp_path, data, "c", ("-U",)) == golden


def test_api_incremental_chunks():
    """Feeding arbitrary chunk sizes through decode() yields the same
    frames as whole-stream decode."""
    from broadway_tpu.api import DecRet, H264Decoder
    from broadway_tpu.core.decoder import Decoder

    data, _ = streams.inter_stream(n_frames=4, seed=904, deblock=True)
    want = [o.frame.tobytes()
            for o in Decoder().decode_annexb(data)]

    dec = H264Decoder()
    got = []
    buf = data
    while buf:
        ret, used = dec.decode(buf)
        while True:
            pic = dec.next_picture()
            if pic is None:
                break
            got.append(pic.output_picture)
        if used <= 0:
            break
        buf = buf[used:]
    while True:
        pic = dec.next_picture(flush=True)
        if pic is None:
            break
        got.append(pic.output_picture)
    assert got == want


def test_get_info():
    from broadway_tpu.api import H264Decoder
    data, info = streams.cropped_stream()
    dec = H264Decoder()
    dec.decode(data)
    i = dec.get_info()
    assert i.pic_width == info["width"]
    assert i.pic_height == info["height"]
    assert i.cropping_flag and i.crop_params == info["crop"]
    assert i.profile == 66

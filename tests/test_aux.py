"""Aux subsystem parity (SURVEY.md §5): evaluation limit, API tracing,
checkpoint/resume, multi-instance isolation."""

import numpy as np
import pytest

import streams
from broadway_tpu.api import DecRet, H264Decoder


def _mkstream(**kw):
    data, _ = streams.inter_stream(width_mbs=4, height_mbs=3, n_frames=5,
                                   seed=41, deblock=True, mvd_range=20,
                                   **kw)
    return data


def _decode_all(dec, data):
    out = []
    off = 0
    rets = []
    while off < len(data):
        ret, used = dec.decode(data[off:])
        rets.append(ret)
        off += used if used else len(data)
        while True:
            p = dec.next_picture()
            if p is None:
                break
            out.append(p.output_picture)
        if ret == DecRet.EVALUATION_LIMIT_EXCEEDED:
            break
    while True:
        p = dec.next_picture(flush=True)
        if p is None:
            break
        out.append(p.output_picture)
    return out, rets


def test_evaluation_limit():
    data = _mkstream()
    dec = H264Decoder(evaluation_limit=2)
    out, rets = _decode_all(dec, data)
    assert DecRet.EVALUATION_LIMIT_EXCEEDED in rets
    assert len(out) <= 2


def test_trace_hook():
    data = _mkstream()
    lines = []
    dec = H264Decoder(trace=lines.append)
    _decode_all(dec, data)
    assert any("H264SwDecDecode#" in ln for ln in lines)
    assert any("PIC_RDY" in ln for ln in lines)


def test_checkpoint_resume():
    from broadway_tpu.bitstream import bitreader as br
    from broadway_tpu.bitstream.bitreader import NalUnit
    from broadway_tpu.core.decoder import Decoder

    data = _mkstream()
    nals = [NalUnit(p) for _, p in br.split_nal_units(data)]

    # reference run: decode everything in one go
    ref = Decoder()
    for nal in nals:
        ref.decode_nal(nal)
    ref.flush()
    want = [o.frame.tobytes() for o in ref.outputs]

    # checkpoint after the 3rd picture, restore into a NEW decoder
    d1 = Decoder()
    produced = []
    k = 0
    state = None
    for i, nal in enumerate(nals):
        d1.decode_nal(nal)
        for o in d1.outputs[len(produced):]:
            produced.append(o.frame.tobytes())
        if d1.pic_number == 3 and state is None and d1.pic is None:
            state = d1.save_state()
            k = i + 1
            break
    assert state is not None
    import pickle
    state = pickle.loads(pickle.dumps(state))   # survives serialization

    d2 = Decoder()
    d2.load_state(state)
    for nal in nals[k:]:
        d2.decode_nal(nal)
    d2.flush()
    rest = [o.frame.tobytes() for o in d1.outputs] + \
        [o.frame.tobytes() for o in d2.outputs]
    got = rest
    # display-order outputs across the checkpoint must match exactly
    assert got == want


def test_multi_instance_isolation():
    import sys
    from multiinstance import run
    data = _mkstream()
    outs = run(data, 3)
    assert outs[0] and outs[0] == outs[1] == outs[2]
    want = b"".join(o.frame.tobytes()
                    for o in __import__("broadway_tpu.core.decoder",
                                        fromlist=["Decoder"])
                    .Decoder().decode_annexb(data))
    assert outs[0] == want


def test_parallel_slice_parse():
    """Threaded per-slice CAVLC parse == serial, bit-exact."""
    from broadway_tpu.bitstream import native as nat
    if not nat.available():
        pytest.skip("native front-end not built")
    from broadway_tpu.core.decoder import Decoder
    data, _ = streams.banded_stream(n_bands=4, height_mbs=4, n_frames=3,
                                    seed=77)
    want = [o.frame.tobytes() for o in Decoder().decode_annexb(data)]
    got = [o.frame.tobytes()
           for o in Decoder(parallel_slices=4).decode_annexb(data)]
    assert got == want


def test_over_level_dpb_fallback():
    """Reference falls back to num_ref_frames when the picture exceeds
    the level's MaxPicSize (h264bsd_seq_param_set.c:306-313)."""
    from broadway_tpu.bitstream.params import Sps
    s = Sps()
    s.level_idc = 40          # max 8192 MBs
    s.width_mbs, s.height_mbs = 240, 135   # 4K = 32400 MBs
    s.num_ref_frames = 3
    assert s.dpb_size() == 3
    s.level_idc = 99          # unknown level
    assert s.dpb_size() == 3

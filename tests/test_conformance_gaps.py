"""Round-2 conformance items: redundant slices, split-buffer streaming
decode, and the per-call intra concealment policy.

References: h264bsd_decoder.c:275/319/475 (skipRedundantSlices),
h264bsd_slice_data.c:133-139 (redundant fallback via decoded flags),
H264SwDecApi.h:82-83 (intraConcealmentMethod)."""

import numpy as np

import streams
from broadway_tpu.api import H264Decoder
from broadway_tpu.core.decoder import Decoder
from conftest import run_oracle


def _decode_all(data, **kw):
    d = Decoder(**kw)
    return b"".join(o.frame.tobytes() for o in d.decode_annexb(data))


def test_redundant_slices_skipped(tmp_path, oracle_dectest):
    """Redundant copies after complete primaries are skipped; output is
    golden vs the reference decoder on the same stream."""
    data, _ = streams.redundant_stream(n_frames=4)
    sp = tmp_path / "r.h264"
    sp.write_bytes(data)
    ref, _ = run_oracle(oracle_dectest, str(sp), str(tmp_path / "ref.yuv"))
    assert _decode_all(data) == ref

    # and identical to the same stream without the redundant slices
    base, _ = streams.redundant_stream(n_frames=4)
    assert _decode_all(base) == ref


def test_redundant_slice_fallback_when_primary_lost(tmp_path,
                                                    oracle_dectest):
    """Primary slice of frame 2 omitted: the redundant slice decodes as
    the fallback picture, golden vs the reference."""
    data, _ = streams.redundant_stream(n_frames=4, drop_primary_of=(2,))
    sp = tmp_path / "rf.h264"
    sp.write_bytes(data)
    ref, _ = run_oracle(oracle_dectest, str(sp), str(tmp_path / "ref.yuv"))
    assert _decode_all(data) == ref


def test_incomplete_final_picture_dropped_at_eos(tmp_path,
                                                 oracle_dectest):
    """A stream whose LAST picture errors (bytes chopped out of its
    slice): the reference drops the incomplete picture at end of
    stream — concealment triggers only when a next AU arrives
    (h264bsd_decoder.c:236-276), and DecTestBench just drains the DPB
    at EOS. Output must be byte-identical (round-5 fix: we used to
    conceal and emit one extra frame)."""
    data, _ = streams.inter_stream(width_mbs=4, height_mbs=3,
                                   n_frames=4, seed=913, deblock=True)
    cut = data[:-60]               # truncate inside the last slice
    sp = tmp_path / "eos.h264"
    sp.write_bytes(cut)
    ref, _ = run_oracle(oracle_dectest, str(sp), str(tmp_path / "r.yuv"))
    assert _decode_all(cut) == ref
    # the parallel-slice (deferred parse) path must agree
    assert _decode_all(cut, parallel_slices=2) == ref


def test_streaming_split_buffers():
    """Feeding the stream in odd-sized chunks (splitting NALs and even
    start codes) through streaming mode reproduces the whole-buffer
    decode exactly."""
    data, _ = streams.inter_stream(width_mbs=4, height_mbs=3, n_frames=4,
                                   seed=17, deblock=True)
    want = _decode_all(data)

    for chunk in (7, 13, 997):
        dec = H264Decoder(streaming=True)
        got = []
        for off in range(0, len(data), chunk):
            dec.decode(data[off:off + chunk])
            while True:
                pic = dec.next_picture()
                if pic is None:
                    break
                got.append(pic.output_picture)
        while True:
            pic = dec.next_picture(flush=True)
            if pic is None:
                break
            got.append(pic.output_picture)
        assert b"".join(got) == want, f"chunk={chunk}"


def test_intra_conceal_from_ref_option():
    """intra_conceal_from_ref=True conceals a lost intra picture from
    the previous reference instead of gray (reference's
    intraConcealmentMethod=1)."""
    from broadway_tpu.bitstream.bitreader import split_nal_units

    data, _ = streams.intra_mixed_stream(width_mbs=4, height_mbs=3,
                                         n_frames=3, seed=23)
    nals = [b"\x00\x00\x00\x01" + p for _, p in split_nal_units(data)]
    # sps, pps, s0 (IDR), s1 (I), s2 (I)
    head = b"".join(nals[:5])

    def run(flag, cut):
        dec = H264Decoder(backend="cpu")
        out = []

        def feed(buf):
            while buf:
                _, used = dec.decode(buf, intra_conceal_from_ref=flag)
                while True:
                    pic = dec.next_picture()
                    if pic is None:
                        break
                    out.append(pic)
                if used <= 0:
                    break
                buf = buf[used:]

        feed(head)
        # intra picture f2 cut so every MB is lost, then the next AU
        # (s1 re-fed) triggers whole-picture concealment — the same
        # sequencing as the reference (conceal on AU boundary)
        feed(nals[4][:cut])
        feed(nals[3])
        while True:
            pic = dec.next_picture(flush=True)
            if pic is None:
                break
            out.append(pic)
        return out

    # find a truncation that loses the whole picture (header parses,
    # first MB fails) — deterministic for this fixed bitstream
    n_mbs = 4 * 3
    for cut in range(7, 60):
        gray = run(False, cut)
        ix = [i for i, p in enumerate(gray)
              if p.nbr_of_err_mbs == n_mbs]
        if ix and (np.frombuffer(gray[ix[0]].output_picture, np.uint8)
                   == 128).all():
            break
    else:
        raise AssertionError("no whole-picture-loss truncation found")
    refc = run(True, cut)
    assert refc[ix[0]].nbr_of_err_mbs == n_mbs
    r = np.frombuffer(refc[ix[0]].output_picture, np.uint8)
    cands = [np.frombuffer(p.output_picture, np.uint8)
             for p in refc[:ix[0]]]
    assert any((r == c).all() for c in cands)
    assert not (r == 128).all()

"""SEI message parser (bitstream/sei.py) vs handcrafted payloads.

Reference syntax: h264bsd_sei.c (h264bsdDecodeSeiMessage :178,
DecodeBufferingPeriod :229, DecodePictureTiming :282,
DecodeRecoveryPoint :601, user data :516/:562). The reference build
skips SEI NALs (h264bsd_decoder.c:480) so decode output is unaffected;
these tests cover the parse capability and that SEI NALs in a stream
neither change pixels nor break decode."""

import sys

import streams
from broadway_tpu.bitstream import sei as SEI
from broadway_tpu.bitstream.params import Hrd, Sps, Vui
from broadway_tpu.core.decoder import Decoder

sys.path.insert(0, "tools")
from h264enc import BitWriter  # noqa: E402


def _msg(ptype: int, payload: bytes) -> bytes:
    out = b""
    t = ptype
    while t >= 255:
        out += b"\xff"
        t -= 255
    out += bytes([t])
    s = len(payload)
    while s >= 255:
        out += b"\xff"
        s -= 255
    out += bytes([s])
    return out + payload


def test_recovery_point_and_userdata():
    w = BitWriter()
    w.ue(3)            # recovery_frame_cnt
    w.flag(True)       # exact_match
    w.flag(False)      # broken_link
    w.u(2, 2)          # changing_slice_group_idc
    w.byte_align_zero()
    rp = w.rbsp()
    uuid = bytes(range(16))
    rbsp = (_msg(SEI.RECOVERY_POINT, rp)
            + _msg(SEI.USER_DATA_UNREGISTERED, uuid + b"hello")
            + _msg(300, b"\x01\x02")        # ff-escaped unknown type
            + b"\x80")                       # rbsp stop bit
    msgs = SEI.parse_sei_rbsp(rbsp)
    assert len(msgs) == 3
    assert isinstance(msgs[0], SEI.RecoveryPoint)
    assert (msgs[0].recovery_frame_cnt, msgs[0].exact_match,
            msgs[0].broken_link, msgs[0].changing_slice_group_idc) \
        == (3, True, False, 2)
    assert isinstance(msgs[1], SEI.UserDataUnregistered)
    assert msgs[1].uuid == uuid and msgs[1].payload == b"hello"
    assert isinstance(msgs[2], SEI.RawSei)
    assert msgs[2].payload_type == 300


def test_buffering_period_with_hrd():
    hrd = Hrd(cpb_cnt=2, initial_cpb_removal_delay_length=20)
    sps = Sps.__new__(Sps)
    sps.vui = Vui(nal_hrd=hrd)
    w = BitWriter()
    w.ue(0)            # seq_parameter_set_id
    for v in (1111, 22, 3333, 44):
        w.u(20, v)
    w.byte_align_zero()
    rbsp = _msg(SEI.BUFFERING_PERIOD, w.rbsp()) + b"\x80"
    msgs = SEI.parse_sei_rbsp(rbsp, {0: sps})
    assert len(msgs) == 1
    bp = msgs[0]
    assert bp.seq_parameter_set_id == 0
    assert bp.nal_cpb == ((1111, 22), (3333, 44))
    assert bp.vcl_cpb == ()


def test_pic_timing_with_pic_struct():
    hrd = Hrd(cpb_removal_delay_length=16, dpb_output_delay_length=16,
              time_offset_length=0)
    sps = Sps.__new__(Sps)
    sps.vui = Vui(nal_hrd=hrd, pic_struct_present=True)
    w = BitWriter()
    w.u(16, 77)        # cpb_removal_delay
    w.u(16, 88)        # dpb_output_delay
    w.u(4, 0)          # pic_struct = frame -> 1 clock ts
    w.flag(True)       # clock_timestamp_flag
    w.u(2, 1)          # ct_type
    w.flag(False)      # nuit_field_based
    w.u(5, 4)          # counting_type
    w.flag(True)       # full_timestamp
    w.flag(False)      # discontinuity
    w.flag(False)      # cnt_dropped
    w.u(8, 12)         # n_frames
    w.u(6, 30)         # seconds
    w.u(6, 15)         # minutes
    w.u(5, 7)          # hours
    w.byte_align_zero()
    rbsp = _msg(SEI.PIC_TIMING, w.rbsp()) + b"\x80"
    msgs = SEI.parse_sei_rbsp(rbsp, {0: sps})
    pt = msgs[0]
    assert (pt.cpb_removal_delay, pt.dpb_output_delay) == (77, 88)
    assert pt.pic_struct == 0
    ts = pt.timestamps[0]
    assert (ts.n_frames, ts.seconds, ts.minutes, ts.hours) \
        == (12, 30, 15, 7)


def test_sei_in_stream_is_inert_and_collected():
    """SEI NALs interleaved into a real stream: decode output is
    bit-identical to the stream without them, and the messages are
    collected on the decoder."""
    data, _ = streams.inter_stream(width_mbs=4, height_mbs=3,
                                   n_frames=3, seed=71, deblock=True)
    w = BitWriter()
    w.ue(5)
    w.flag(False)
    w.flag(False)
    w.u(2, 0)
    w.byte_align_zero()
    sei_rbsp = _msg(SEI.RECOVERY_POINT, w.rbsp()) + b"\x80"
    sei_nal = b"\x00\x00\x00\x01\x06" + sei_rbsp
    # insert after the first start code group (after SPS/PPS)
    with_sei = data + sei_nal          # trailing SEI
    first_idr = data.find(b"\x00\x00\x00\x01\x65")
    if first_idr > 0:
        with_sei = (data[:first_idr] + sei_nal + data[first_idr:]
                    + sei_nal)
    want = [o.frame.tobytes() for o in Decoder().decode_annexb(data)]
    d = Decoder()
    got = [o.frame.tobytes() for o in d.decode_annexb(with_sei)]
    assert got == want
    rps = [m for m in d.sei_messages
           if isinstance(m, SEI.RecoveryPoint)]
    assert len(rps) >= 1 and rps[0].recovery_frame_cnt == 5

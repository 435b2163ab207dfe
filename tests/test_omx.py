"""OMX-style embedding component (broadway_tpu/omx.py) vs the
reference SoftAVC contract (Decoder/SoftAVC.cpp): port-settings-change
handshake on new/changed dimensions, output gating until the client
reconfigures, EOS drain with the last buffer flagged."""

import os

import streams
from broadway_tpu.omx import Event, SoftAvc
from conftest import run_oracle


def _oracle(tmp_path, dectest, data, name):
    sp = os.path.join(str(tmp_path), name + ".h264")
    op = os.path.join(str(tmp_path), name + ".yuv")
    with open(sp, "wb") as f:
        f.write(data)
    return run_oracle(dectest, sp, op)[0]


def test_port_settings_and_eos(oracle_dectest, tmp_path):
    a, _ = streams.inter_stream(width_mbs=4, height_mbs=3, n_frames=3,
                                seed=61, deblock=True)
    b, _ = streams.inter_stream(width_mbs=6, height_mbs=5, n_frames=3,
                                seed=62, deblock=True)
    data = a + b
    ref = _oracle(tmp_path, oracle_dectest, data, "omx")

    events = []
    c = SoftAvc(event_cb=lambda ev, args: events.append((ev, args)))

    # feed in chunks through the 8-deep input port
    chunk = 700
    pos = 0
    outs = []
    while pos < len(data):
        nxt = min(pos + chunk, len(data))
        if not c.queue_input(data[pos:nxt], eos=(nxt == len(data))):
            # input port full: drain outputs / ack settings
            while True:
                if c.output_port.enabled is False:
                    c.reconfigure_output()
                o = c.dequeue_output()
                if o is None:
                    break
                outs.append(o)
            continue
        pos = nxt
    # drain the rest (dequeue until empty, acking settings changes)
    while True:
        if c.output_port.enabled is False:
            c.reconfigure_output()
        o = c.dequeue_output()
        if o is None:
            if c.eos_delivered and c.output_port.enabled:
                break
            continue
        outs.append(o)

    changes = [e for e in events if e[0] == Event.PORT_SETTINGS_CHANGED]
    assert [args for _, args in changes] == [(64, 48), (96, 80)], changes
    frames = [o for o in outs if o.data]
    assert len(frames) == 6
    assert [f.width for f in frames] == [64, 64, 64, 96, 96, 96]
    assert b"".join(f.data for f in frames) == ref
    assert outs[-1].eos or frames[-1].eos


def test_output_gated_until_reconfigure():
    data, _ = streams.inter_stream(width_mbs=4, height_mbs=3,
                                   n_frames=2, seed=64, deblock=True)
    c = SoftAvc()
    c.queue_input(data, eos=True)
    # before the client acks the initial settings change, no output
    assert c.output_port.enabled is False
    assert c.dequeue_output() is None
    c.reconfigure_output()
    o = c.dequeue_output()
    assert o is not None and o.width == 64 and o.height == 48

"""Lockstep multi-stream batched decode (single chip, LANE-axis
batching) must be bit-exact vs per-stream decode. Runs the kernels in
Pallas interpret mode in a clean CPU subprocess."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tools")
import streams
from broadway_tpu.core.decoder import Decoder
from broadway_tpu.parallel.streams import decode_streams_lockstep

datas = [streams.inter_stream(width_mbs=4, height_mbs=3, n_frames=3,
                              seed=s, deblock=True, mvd_range=30)[0]
         for s in (11, 12, 13)]
wants = [[o.frame.tobytes() for o in Decoder().decode_annexb(d)]
         for d in datas]
gots = decode_streams_lockstep(datas, parallel_slices=2)
assert gots == wants, [i for i, (g, w) in enumerate(zip(gots, wants))
                       if g != w]
print("LOCKSTEP-OK")
"""


_SCRIPT_UNEQUAL = r"""
import sys
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tools")
import streams
from broadway_tpu.core.decoder import Decoder
from broadway_tpu.parallel.streams import decode_streams_lockstep

# legal unequal picture counts: streams that end leave the lockstep
# and the rest continue at a smaller batch (round-3 VERDICT weak #6)
datas = [streams.inter_stream(width_mbs=4, height_mbs=3, n_frames=n,
                              seed=s, deblock=True, mvd_range=30)[0]
         for s, n in ((21, 2), (22, 4), (23, 3))]
wants = [[o.frame.tobytes() for o in Decoder().decode_annexb(d)]
         for d in datas]
gots = decode_streams_lockstep(datas, parallel_slices=2)
assert [len(g) for g in gots] == [2, 4, 3]
assert gots == wants, [i for i, (g, w) in enumerate(zip(gots, wants))
                       if g != w]
print("LOCKSTEP-UNEQUAL-OK")
"""


def _run(script, token):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("BW_FRONTEND", None)
    r = subprocess.run(
        [sys.executable, "-c", script % {"repo": REPO}],
        capture_output=True, text=True, timeout=1800, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-4000:]
    assert token in r.stdout


_SCRIPT_FALLBACK = r"""
import sys
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tools")
import streams
from broadway_tpu.core.decoder import Decoder
from broadway_tpu.core import packed as PK
from broadway_tpu.parallel.streams import decode_streams_lockstep

datas = [streams.inter_stream(width_mbs=4, height_mbs=3, n_frames=3,
                              seed=s, deblock=True, mvd_range=30)[0]
         for s in (31, 32)]
wants = [[o.frame.tobytes() for o in Decoder().decode_annexb(d)]
         for d in datas]

# force the v2 packer to decline every third picture: the lockstep
# must fall back to a per-stream pipeline round, not abort
orig = PK.pack_picture_v2
calls = [0]
def flaky(*a, **k):
    calls[0] += 1
    if calls[0] %% 3 == 0:
        return None
    return orig(*a, **k)
PK.pack_picture_v2 = flaky

gots = decode_streams_lockstep(datas, parallel_slices=2)
assert calls[0] >= 3
assert gots == wants, [i for i, (g, w) in enumerate(zip(gots, wants))
                       if g != w]
print("LOCKSTEP-FALLBACK-OK")
"""


_SCRIPT_CHUNKED = r"""
import os, sys
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tools")
os.environ["BW_LOCKSTEP_SUB"] = "2"   # device batch chunked at 2
import streams
from broadway_tpu.core.decoder import Decoder
from broadway_tpu.parallel.streams import decode_streams_lockstep

# 3 streams with a 2-wide device chunk: rounds run as a full=False
# 2-chunk (ref-stack gather/scatter) + a 1-chunk — the compile-
# failure fallback's steady-state shape
datas = [streams.inter_stream(width_mbs=4, height_mbs=3, n_frames=3,
                              seed=s, deblock=True, mvd_range=30)[0]
         for s in (41, 42, 43)]
wants = [[o.frame.tobytes() for o in Decoder().decode_annexb(d)]
         for d in datas]
gots = decode_streams_lockstep(datas, parallel_slices=2)
assert gots == wants, [i for i, (g, w) in enumerate(zip(gots, wants))
                       if g != w]
print("LOCKSTEP-CHUNKED-OK")
"""


def test_lockstep_batched_decode():
    _run(_SCRIPT, "LOCKSTEP-OK")


def test_lockstep_chunked_device_batch():
    _run(_SCRIPT_CHUNKED, "LOCKSTEP-CHUNKED-OK")


def test_lockstep_pack_decline_fallback():
    _run(_SCRIPT_FALLBACK, "LOCKSTEP-FALLBACK-OK")


def test_lockstep_unequal_lengths():
    _run(_SCRIPT_UNEQUAL, "LOCKSTEP-UNEQUAL-OK")

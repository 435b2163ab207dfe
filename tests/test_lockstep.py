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


def test_lockstep_batched_decode():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("BW_FRONTEND", None)
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=1800, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-4000:]
    assert "LOCKSTEP-OK" in r.stdout

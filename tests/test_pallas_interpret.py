"""Pallas kernel correctness pinned in pytest WITHOUT TPU hardware:
the MC, intra-wavefront, and deblock-wavefront kernels run in Pallas
interpret mode (mc/wf = "pallas_interp") on the CPU backend and must
match the XLA-op reference path bit-for-bit.

Runs in a subprocess so JAX_PLATFORMS=cpu applies regardless of the
platform this pytest process is bound to (VERDICT round 1, weak #6)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tools")
import numpy as np
import jax.numpy as jnp
import streams
from bench_common import parse_pictures
from broadway_tpu.core import recon_tpu as RT

data, _ = streams.inter_stream(width_mbs=6, height_mbs=5, n_frames=3,
                               seed=5, deblock=True, mvd_range=60)
pics = parse_pictures(data)
assert len(pics) == 3
from broadway_tpu.ops.tpu import mc_pallas as K_mcp
rng = np.random.RandomState(0)
for arrs, w, h, cqo, n_slots in pics:
    steps = {k: jnp.asarray(v) for k, v in RT.step_tables(w, h).items()}
    arrs = {k: jnp.asarray(v) for k, v in arrs.items()}
    hy, wy = K_mcp.luma_ext_dims(w * 16, h * 16)
    hc, wc = K_mcp.chroma_ext_dims(w * 16, h * 16)
    ref_y = jnp.asarray(rng.randint(0, 256, (n_slots, hy, wy)), jnp.int32)
    ref_c = jnp.asarray(rng.randint(0, 256, (n_slots, hc, wc)), jnp.int32)
    want = RT.decode_picture(arrs, ref_y, ref_c, steps, w_mbs=w, h_mbs=h,
                             chroma_qp_offset=cqo, mc="xla", wf="xla")
    got = RT.decode_picture(arrs, ref_y, ref_c, steps, w_mbs=w, h_mbs=h,
                            chroma_qp_offset=cqo, mc="pallas_interp",
                            wf="pallas_interp")
    for g, wv, name in zip(got, want, "y cb cr".split()):
        g, wv = np.asarray(g), np.asarray(wv)
        assert np.array_equal(g, wv), (
            name, np.argwhere(g != wv)[:4], g.shape)
print("INTERPRET-OK")
"""


_SCRIPT_LS = r"""
import sys
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tools")
import numpy as np
import jax
import jax.numpy as jnp
import streams
from bench_common import parse_pictures
from broadway_tpu.core import recon_tpu as RT
from broadway_tpu.ops.tpu import mc_pallas as K_mcp

# two different streams, batched along the LANE axis -> must equal the
# per-stream single decode bit-for-bit
pics = []
for seed in (5, 23):
    data, _ = streams.inter_stream(width_mbs=6, height_mbs=5, n_frames=2,
                                   seed=seed, deblock=True, mvd_range=40)
    pics.append(parse_pictures(data)[-1])
(a0, w, h, cqo, R), (a1, _, _, _, _) = pics
rng = np.random.RandomState(1)
hy, wy = K_mcp.luma_ext_dims(w * 16, h * 16)
hc, wc = K_mcp.chroma_ext_dims(w * 16, h * 16)
refs = [(jnp.asarray(rng.randint(0, 256, (R, hy, wy)), jnp.int32),
         jnp.asarray(rng.randint(0, 256, (R, hc, wc)), jnp.int32))
        for _ in range(2)]
steps = {k: jnp.asarray(v) for k, v in RT.step_tables(w, h).items()}
singles = []
for arrs, (ry, rc) in zip((a0, a1), refs):
    arrs = {k: jnp.asarray(v) for k, v in arrs.items()}
    singles.append(RT.decode_picture(
        arrs, ry, rc, steps, w_mbs=w, h_mbs=h, chroma_qp_offset=cqo,
        mc="pallas_interp", wf="pallas_interp"))
flat = {k: jnp.concatenate([jnp.asarray(a0[k]).reshape((-1,) +
                                                       a0[k].shape[1:]),
                            jnp.asarray(a1[k]).reshape((-1,) +
                                                       a1[k].shape[1:])])
        for k in a0 if k != "whole_conceal"}
flat["whole_conceal"] = jnp.asarray([False, False])
bry = jnp.concatenate([refs[0][0], refs[1][0]])
brc = jnp.concatenate([refs[0][1], refs[1][1]])
got = RT.decode_picture(flat, bry, brc, steps, w_mbs=w, h_mbs=h,
                        chroma_qp_offset=cqo, mc="pallas_interp",
                        wf="pallas_interp", batch=2)
for b in range(2):
    for g, wv, name in zip((got[0][b], got[1][b], got[2][b]),
                           singles[b], "y cb cr".split()):
        g, wv = np.asarray(g), np.asarray(wv)
        assert np.array_equal(g, wv), (
            b, name, np.argwhere(g != wv)[:4])
print("LS-BATCH-OK")
"""


def _run(script):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # neutralize the axon TPU-tunnel site hook so this subprocess is a
    # true CPU process (no contention with the real chip)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("BW_FRONTEND", None)
    return subprocess.run(
        [sys.executable, "-c", script % {"repo": REPO}],
        capture_output=True, text=True, timeout=1800, env=env)


def test_pallas_kernels_interpret_mode():
    r = _run(_SCRIPT)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-4000:]
    assert "INTERPRET-OK" in r.stdout


def test_pallas_ls_batch_interpret_mode():
    """LS-axis (lane) stream batching must be bit-exact vs per-stream
    decode (the multi-stream scaling path; cross-stream lane bleed is
    masked by availability/filter flags)."""
    r = _run(_SCRIPT_LS)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-4000:]
    assert "LS-BATCH-OK" in r.stdout

"""Multi-stream (data-parallel) decode: the TPU analogue of the
reference's multi-instance / multi-player parallelism
(Decoder/src/TestBenchMultipleInstance.c, Player/storyDemo.html 6-player
matrix — SURVEY.md §2.5 P3).

A batch of per-picture tensor bundles (one per stream, same resolution)
runs through the jitted pixel pipeline under vmap; on a device mesh the
batch axis is sharded over "dp" so each chip decodes its share of streams.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.recon_tpu import decode_picture_impl, default_mc_backend


def _batched_impl(arrs, ref_y, ref_c, steps, w_mbs, h_mbs,
                  chroma_qp_offset, mc="xla"):
    """Batched decode [B, ...]. The Pallas MC kernel doesn't vmap, so
    the batch is flattened into the MB axis for stage 2 (ref slot
    indices get a per-stream offset) and the rest of the pipeline runs
    under vmap."""
    B = ref_y.shape[0]
    R = ref_y.shape[1]

    if mc == "pallas":
        # TPU path: one impl call, streams stacked along the MB /
        # diagonal axes (the Pallas kernels' masks make cross-stream
        # neighbour edges no-ops, exactly like picture borders).
        flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in
                arrs.items()}
        return decode_picture_impl(
            flat, ref_y.reshape((-1,) + ref_y.shape[2:]),
            ref_c.reshape((-1,) + ref_c.shape[2:]), steps,
            w_mbs=w_mbs, h_mbs=h_mbs,
            chroma_qp_offset=chroma_qp_offset,
            mc="pallas", wf="pallas", batch=B)

    def one(a, ry, rc):
        return decode_picture_impl(a, ry, rc, steps, w_mbs=w_mbs,
                                   h_mbs=h_mbs,
                                   chroma_qp_offset=chroma_qp_offset,
                                   mc=mc)

    return jax.vmap(one, in_axes=(0, 0, 0))(arrs, ref_y, ref_c)


decode_pictures_batch = functools.partial(
    jax.jit, static_argnames=("w_mbs", "h_mbs", "chroma_qp_offset", "mc"))(
        _batched_impl)


def decode_streams_lockstep(datas, mc: str = None,
                            parallel_slices: int = 4,
                            fetch: bool = True):
    """End-to-end lockstep decode of N same-geometry, same-length,
    error-free streams on ONE chip: each picture round batches all N
    compact uploads through one jitted pipeline pass with streams on
    the wavefront LANE axis — the single-chip multi-instance mode
    (reference: TestBenchMultipleInstance.c round-robin instances,
    storyDemo.html 6 players). Returns per-stream display-order YUV.

    Streams must stay picture-aligned (same resolution and picture
    count; no decode errors) — the bench/demo contract, matching the
    reference testbench's round-robin over one input stream."""
    import threading

    import numpy as np

    import broadway_tpu.core.decoder as DEC
    from ..core import packed as PK
    from ..core import recon_tpu as RT
    from ..ops.tpu import mc_pallas as K_mcp

    B = len(datas)
    barrier = threading.Barrier(B)
    staging = [None] * B
    results = [None] * B
    state = {}
    if mc is None:
        import jax
        # LANE-axis batching needs the kernel path; interpret mode is
        # the CPU-correctness twin
        mc = "pallas" if jax.default_backend() == "tpu" \
            else "pallas_interp"

    def make_recon(i):
        scratch = {}

        def recon(self, pic):
            pps, sps = self.pps, self.sps
            w, h = sps.width_mbs, sps.height_mbs
            lay = PK.get_packed_layout_v2(w, h)
            if scratch.get("lay") is not lay:
                scratch["lay"] = lay
                scratch["s"] = PK.PackScratchV2(lay)
            res = PK.pack_picture_v2(pic, lay, scratch["s"])
            assert res is not None, "lockstep requires v2-packable pics"
            buf, bk = res
            R = self.dpb.dpb_size + 1
            staging[i] = (buf, bk, self.dpb.current.slot, w, h, R,
                          pps.constrained_intra_pred,
                          pps.chroma_qp_index_offset)
            barrier.wait()
            if i == 0:
                import jax
                import jax.numpy as jnp
                lay = scratch["lay"]
                BK = tuple(max(s[1][j] for s in staging)
                           for j in range(3))
                bufs = np.stack([PK.expand_buf_v2(s[0], lay, s[1], BK)
                                 for s in staging])
                Rmax = max(s[5] for s in staging)
                key = (w, h, Rmax)
                if state.get("key") != key:
                    hy, wy = K_mcp.luma_ext_dims(sps.width, sps.height)
                    hc, wc = K_mcp.chroma_ext_dims(sps.width, sps.height)
                    state["key"] = key
                    state["sy"] = jnp.zeros((B, Rmax, hy, wy), jnp.int32)
                    state["sc"] = jnp.zeros((B, Rmax, hc, wc), jnp.int32)
                    state["steps"] = {k: jnp.asarray(v) for k, v in
                                      RT.step_tables(w, h).items()}
                slots = jnp.asarray([s[2] for s in staging], jnp.int32)
                y, cb, cr, yuv, state["sy"], state["sc"] = \
                    RT.decode_pictures_packed_batch(
                        jax.device_put(bufs), state["sy"], state["sc"],
                        slots, state["steps"], lay=lay, bk=BK,
                        constrained_intra=staging[0][6],
                        chroma_qp_offset=staging[0][7],
                        mc=mc, wf=mc, batch=B)
                for b in range(B):
                    results[b] = RT.TpuFrame(y[b], cb[b], cr[b],
                                             pad=False, yuv_u8=yuv[b])
            barrier.wait()
            return results[i]
        return recon

    outs = [None] * B
    errors = []

    def run(i):
        try:
            d = DEC.Decoder(backend="cpu", recon_strategy=make_recon(i),
                            parallel_slices=parallel_slices)
            got = d.decode_annexb(datas[i])
            if fetch:
                outs[i] = [o.frame.tobytes() for o in got]
            else:
                import jax
                for o in got:
                    jax.block_until_ready(o.frame.y)
                outs[i] = got
        except Exception as e:
            errors.append(e)
            barrier.abort()

    threads = [threading.Thread(target=run, args=(i,)) for i in range(B)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return outs


def make_dp_mesh(devices=None, name: str = "dp") -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (name,))


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Place a batched pytree with the leading axis sharded over `axis`."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)

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

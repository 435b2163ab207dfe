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

from ..core.recon_tpu import decode_picture_impl


def _batched_impl(arrs, ref_y, ref_cb, ref_cr, steps, w_mbs, h_mbs,
                  chroma_qp_offset):
    f = functools.partial(decode_picture_impl, w_mbs=w_mbs, h_mbs=h_mbs,
                          chroma_qp_offset=chroma_qp_offset)
    return jax.vmap(f, in_axes=(0, 0, 0, 0, None))(
        arrs, ref_y, ref_cb, ref_cr, steps)


decode_pictures_batch = functools.partial(
    jax.jit, static_argnames=("w_mbs", "h_mbs", "chroma_qp_offset"))(
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

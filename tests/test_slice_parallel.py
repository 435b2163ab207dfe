"""Slice-parallel sharded decode on a virtual CPU mesh vs single-chip."""

import numpy as np
import pytest

import streams


def test_sliced_decode_matches_single():
    import jax
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("need 4 virtual cpu devices")
    from jax.sharding import Mesh
    from broadway_tpu.core.decoder import Decoder
    from broadway_tpu.parallel.slices import decode_stream_sliced

    data, _ = streams.banded_stream(n_bands=4, height_mbs=4, n_frames=3,
                                    seed=702)
    want = [o.frame.tobytes() for o in Decoder().decode_annexb(data)]
    mesh = Mesh(np.array(cpus[:4]), ("sp",))
    got = decode_stream_sliced(data, mesh, n_bands=4)
    assert len(got) == len(want)
    for i, (a, b) in enumerate(zip(got, want)):
        assert a == b, f"frame {i} differs"

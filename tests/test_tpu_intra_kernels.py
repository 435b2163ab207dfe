"""Unit: jitted intra predictors vs NumPy oracle kernels."""

import numpy as np

from broadway_tpu.ops import intra as cpu_intra


def test_i4x4_tables_match_scalar():
    import jax.numpy as jnp
    from broadway_tpu.ops.tpu import intra as tpu_intra
    rng = np.random.RandomState(0)
    cases = []
    for mode in range(9):
        for au in (True, False):
            for al in (True, False):
                for _ in range(8):
                    up = rng.randint(0, 256, 8)
                    left = rng.randint(0, 256, 4)
                    ul = int(rng.randint(0, 256))
                    cases.append((mode, up, left, ul, au, al))
    v = np.zeros((len(cases), 13), np.int32)
    modes = np.zeros(len(cases), np.int32)
    aus = np.zeros(len(cases), bool)
    als = np.zeros(len(cases), bool)
    want = np.zeros((len(cases), 4, 4), np.int32)
    for i, (mode, up, left, ul, au, al) in enumerate(cases):
        v[i, 0] = ul
        v[i, 1:9] = up
        v[i, 9:13] = left
        modes[i] = mode
        aus[i] = au
        als[i] = al
        want[i] = cpu_intra.intra4x4(mode, up.astype(np.int32),
                                     left.astype(np.int32), ul, au, al)
    got = np.asarray(tpu_intra.predict_i4x4_batch(
        jnp.asarray(v), jnp.asarray(modes), jnp.asarray(aus),
        jnp.asarray(als)))
    bad = np.nonzero((got != want).any(axis=(1, 2)))[0]
    assert bad.size == 0, (bad[:5], cases[bad[0]][0] if bad.size else None)


def test_i16_and_chroma_match_scalar():
    import jax.numpy as jnp
    from broadway_tpu.ops.tpu import intra as tpu_intra
    rng = np.random.RandomState(1)
    n = 0
    vs, ms, aus, als, want = [], [], [], [], []
    for mode in range(4):
        for au in (True, False):
            for al in (True, False):
                for _ in range(5):
                    up = rng.randint(0, 256, 16)
                    left = rng.randint(0, 256, 16)
                    ul = int(rng.randint(0, 256))
                    vs.append((up, left, ul))
                    ms.append(mode)
                    aus.append(au)
                    als.append(al)
                    want.append(cpu_intra.intra16x16(
                        mode, up.astype(np.int32), left.astype(np.int32),
                        ul, au, al))
    up = jnp.asarray(np.array([v[0] for v in vs], np.int32))
    left = jnp.asarray(np.array([v[1] for v in vs], np.int32))
    ul = jnp.asarray(np.array([v[2] for v in vs], np.int32))
    got = np.asarray(tpu_intra.predict_i16_batch(
        up, left, ul, jnp.asarray(np.array(ms, np.int32)),
        jnp.asarray(np.array(aus)), jnp.asarray(np.array(als))))
    assert (got == np.array(want)).all()

    vs, ms, aus, als, want = [], [], [], [], []
    for mode in range(4):
        for au in (True, False):
            for al in (True, False):
                for _ in range(5):
                    up = rng.randint(0, 256, 8)
                    left = rng.randint(0, 256, 8)
                    ul = int(rng.randint(0, 256))
                    vs.append((up, left, ul))
                    ms.append(mode)
                    aus.append(au)
                    als.append(al)
                    want.append(cpu_intra.intra_chroma(
                        mode, up.astype(np.int32), left.astype(np.int32),
                        ul, au, al))
    up = jnp.asarray(np.array([v[0] for v in vs], np.int32))
    left = jnp.asarray(np.array([v[1] for v in vs], np.int32))
    ul = jnp.asarray(np.array([v[2] for v in vs], np.int32))
    got = np.asarray(tpu_intra.predict_chroma_batch(
        up, left, ul, jnp.asarray(np.array(ms, np.int32)),
        jnp.asarray(np.array(aus)), jnp.asarray(np.array(als))))
    assert (got == np.array(want)).all()

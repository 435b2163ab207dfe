#!/usr/bin/env python3
"""Calibrate host->device transfer on this platform: latency, bandwidth,
async behavior, threading."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    for mb in (0.001, 0.25, 1, 2, 4, 8, 16):
        a = np.random.randint(0, 255, int(mb * 1e6), np.uint8)
        x = jax.device_put(a, dev)
        jax.block_until_ready(x)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            x = jax.device_put(a, dev)
            jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / reps
        # async: how long does dispatch take before block?
        t0 = time.perf_counter()
        xs = [jax.device_put(a, dev) for _ in range(reps)]
        t_disp = (time.perf_counter() - t0) / reps
        jax.block_until_ready(xs)
        print(f"{mb:7.3f} MB: put+block {dt * 1e3:7.1f} ms "
              f"({mb / dt:6.1f} MB/s), dispatch-only {t_disp * 1e3:7.1f} ms",
              flush=True)

    # two threads uploading concurrently: does it overlap?
    from concurrent.futures import ThreadPoolExecutor
    a = np.random.randint(0, 255, int(8e6), np.uint8)

    def up():
        x = jax.device_put(a, dev)
        jax.block_until_ready(x)

    up()
    with ThreadPoolExecutor(2) as ex:
        t0 = time.perf_counter()
        list(ex.map(lambda _: up(), range(2)))
        dt2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    up()
    up()
    dt_serial = time.perf_counter() - t0
    print(f"2x8MB serial {dt_serial * 1e3:.1f} ms, "
          f"2 threads {dt2 * 1e3:.1f} ms", flush=True)

    # upload while device computes: overlap?
    m = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def heavy(m):
        def body(i, x):
            return jnp.tanh(x @ m)
        return jax.lax.fori_loop(0, 60, body, m)

    r = heavy(m)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = heavy(m)
    jax.block_until_ready(r)
    t_comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = heavy(m)
    up()
    jax.block_until_ready(r)
    t_both = time.perf_counter() - t0
    print(f"compute {t_comp * 1e3:.1f} ms; compute+8MB-upload "
          f"{t_both * 1e3:.1f} ms (overlap if ~= compute)", flush=True)

    # device->host
    x = jax.device_put(np.zeros(int(4e6), np.uint8), dev)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(x)
    print(f"readback 4MB: {(time.perf_counter() - t0) / 5 * 1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()

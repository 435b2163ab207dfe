#!/usr/bin/env python3
"""Second-pass transfer calibration: repeatability + readback sizes."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import numpy as np

    dev = jax.devices()[0]

    for trial in range(3):
        line = []
        for mb in (4, 8, 12, 16, 20):
            a = np.random.randint(0, 255, int(mb * 1e6), np.uint8)
            x = jax.device_put(a, dev)
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            for _ in range(3):
                x = jax.device_put(a, dev)
                jax.block_until_ready(x)
            dt = (time.perf_counter() - t0) / 3
            line.append(f"{mb}MB:{dt * 1e3:6.1f}ms")
        print("up  ", " ".join(line), flush=True)

    for trial in range(3):
        line = []
        for mb in (1, 3, 4, 8):
            x = jax.device_put(
                np.random.randint(0, 255, int(mb * 1e6), np.uint8), dev)
            jax.block_until_ready(x)
            _ = np.asarray(x)
            t0 = time.perf_counter()
            for _ in range(3):
                _ = np.asarray(x)
            dt = (time.perf_counter() - t0) / 3
            line.append(f"{mb}MB:{dt * 1e3:6.1f}ms")
        print("down", " ".join(line), flush=True)


if __name__ == "__main__":
    main()

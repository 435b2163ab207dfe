#!/usr/bin/env python3
"""Multi-instance testbench — mirror of the reference's
Decoder/src/TestBenchMultipleInstance.c: N independent decoder instances
round-robin over the same stream, per-instance output files, verifying
instance isolation (no globals in the engine).

  multiinstance.py [-nN] [-B backend] file.h264
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(data: bytes, n_instances: int, backend: str = "cpu"):
    """Round-robin step N instances; returns per-instance YUV bytes."""
    from broadway_tpu.api import DecRet, H264Decoder

    insts = [H264Decoder(backend=backend) for _ in range(n_instances)]
    offs = [0] * n_instances
    done = [False] * n_instances
    outs = [bytearray() for _ in range(n_instances)]

    def drain(i):
        while True:
            pic = insts[i].next_picture()
            if pic is None:
                break
            outs[i] += pic.output_picture

    while not all(done):
        for i in range(n_instances):
            if done[i]:
                continue
            ret, used = insts[i].decode(data[offs[i]:])
            offs[i] += used
            drain(i)
            if offs[i] >= len(data) or ret == DecRet.STRM_ERR:
                while True:
                    pic = insts[i].next_picture(flush=True)
                    if pic is None:
                        break
                    outs[i] += pic.output_picture
                done[i] = True
    return [bytes(o) for o in outs]


def main(argv):
    n = 2
    backend = "cpu"
    fname = None
    for a in argv[1:]:
        if a.startswith("-n"):
            n = int(a[2:])
        elif a.startswith("-B"):
            backend = a[2:].strip() or argv[argv.index(a) + 1]
        elif not a.startswith("-"):
            fname = a
    if not fname:
        print(__doc__)
        return 1
    with open(fname, "rb") as f:
        data = f.read()
    outs = run(data, n, backend)
    base = os.path.splitext(os.path.basename(fname))[0]
    for i, o in enumerate(outs):
        out = f"{base}_inst{i}.yuv"
        with open(out, "wb") as f:
            f.write(o)
        print(f"instance {i}: {len(o)} bytes -> {out}")
    ok = all(o == outs[0] for o in outs)
    print("instances identical:", ok)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv))

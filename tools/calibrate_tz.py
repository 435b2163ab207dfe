"""One-off calibration: recover the exact total_zeros code tables from the
reference decoder by black-box probing build/oracle/harness.

For a block with total_coeff=tc, the bits after coeff_token+signs+levels are
total_zeros then run_before codes. We enumerate all 9-bit tails; when every
run decodes as 0 (tail of 1-bits), consumed bits arithmetic yields the
total_zeros code length and the decoded first-coeff position yields its
value. Prints corrected table rows for broadway_tpu/bitstream/cavlc_tables.py.
"""

import subprocess
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from h264enc import BitWriter
from broadway_tpu.bitstream.cavlc_tables import COEFF_TOKEN


class H:
    def __init__(self, path):
        self.p = subprocess.Popen([path], stdin=subprocess.PIPE,
                                  stdout=subprocess.PIPE, text=True)

    def cavlc(self, nc, maxc, data):
        self.p.stdin.write(f"cavlc {nc} {maxc} {data.hex()}\n")
        self.p.stdin.flush()
        r = self.p.stdout.readline().split()
        if r[0] != "ok":
            return None
        return int(r[1]), int(r[2]), [int(x) for x in r[3:19]]


def run0_len(zl):
    if zl == 0:
        return 0
    if zl <= 2:
        return 1
    if zl <= 6:
        return 2
    return 3


def calibrate(h, max_coeffs, nc):
    # prefix: coeff_token(to=min(tc,3), tc) + tc sign bits for trailing ones
    # (use all +1 coefficients; for tc>3 the extra ones are regular levels
    # with known encoding: levelCode = 0 -> unary '1', 1 bit each, after
    # the first which gets levelCode-2 ... so instead use trailing<=3 and
    # levels of +2: levelCode=2 -> '001' (3 bits) at suffixLength 0, then
    # suffixLength becomes 1 -> '10' (2 bits) ... messy. Simplest: build the
    # prefix with the shared encoder and trust its level lengths (validated
    # separately), but zero out total_zeros+runs by truncating at the known
    # bit position. We reconstruct the prefix length by encoding a block
    # with tz=0 (coeffs packed at scan start... tz=0 means last nonzero at
    # position tc-1) -> then total_zeros code is the row's tz=0 entry which
    # we do NOT know. So instead compute prefix length analytically.
    from cavlc_enc import encode_residual_block

    rows = {}
    for tc in range(1, max_coeffs + 1):
        if tc == max_coeffs:
            continue  # no total_zeros coded
        # Build prefix bits: encode block with all coeffs at positions
        # 0..tc-1 (tz=0), then strip the tz code by re-encoding manually.
        to = min(tc, 3)
        w = BitWriter()
        ln, bits = COEFF_TOKEN[4 if nc == -1 else 0][(to, tc)]
        w.u(ln, bits)
        for _ in range(to):
            w.u(1, 0)  # +1 signs
        # regular levels: +2 each; replicate encoder's level coding
        suffix_length = 1 if (tc > 10 and to < 3) else 0
        nlev = tc - to
        for i in range(nlev):
            level = 2
            level_code = 2 * (level - 1)
            if i == 0 and to < 3:
                level_code -= 2
            if suffix_length == 0:
                w.u(level_code + 1, 1)
            else:
                prefix = level_code >> suffix_length
                w.u(prefix + 1, 1)
                w.u(suffix_length, level_code & ((1 << suffix_length) - 1))
            if suffix_length == 0:
                suffix_length = 1
            if 2 > (3 << (suffix_length - 1)) and suffix_length < 6:
                suffix_length += 1
        plen = w.bitpos
        prefix_bits = list(w._bits)

        found = {}
        for tail in range(512):
            w2 = BitWriter()
            w2._bits = list(prefix_bits)
            w2.u(9, tail)
            # pad with ones so run_before reads decode as run 0
            for _ in range(32):
                w2.u(1, 1)
            w2.byte_align_zero()
            res = h.cavlc(nc, max_coeffs, w2.rbsp())
            if res is None:
                continue
            got_tc, consumed, coeffs = res
            if got_tc != tc:
                continue
            positions = [i for i, c in enumerate(coeffs) if c]
            if len(positions) != tc:
                continue
            # require all runs 0: positions consecutive
            if positions != list(range(positions[0], positions[0] + tc)):
                continue
            tz = positions[0]
            clen = consumed - plen - (tc - 1) * run0_len(tz)
            if clen <= 0 or clen > 9:
                continue
            code = tail >> (9 - clen)
            prev = found.get(tz)
            if prev is None or clen < prev[0]:
                found[tz] = (clen, code)
        rows[tc] = found
    return rows


def main():
    h = H("/root/repo/build/oracle/harness")
    print("# total_zeros 4x4 (nc=0 probe)")
    rows = calibrate(h, 16, 0)
    for tc in sorted(rows):
        row = rows[tc]
        entries = [row.get(tz, ("??", "??")) for tz in range(16 - tc + 1)]
        print(f"    {tc}: {[tuple(e) for e in entries]},")
    print("# total_zeros chroma DC")
    rows = calibrate(h, 4, -1)
    for tc in sorted(rows):
        row = rows[tc]
        entries = [row.get(tz, ("??", "??")) for tz in range(4 - tc + 1)]
        print(f"    {tc}: {[tuple(e) for e in entries]},")


if __name__ == "__main__":
    main()

"""Validate the shared CAVLC tables + encoder against the reference
decoder's h264bsdDecodeResidualBlockCavlc (via build/oracle/harness).

Every (trailing_ones, total_coeff) coeff_token entry in every nC class,
every total_zeros value, the run_before tables, level suffix adaptation and
both escape forms are covered. A mismatch pinpoints the broken table entry.
"""

import random

from h264enc import BitWriter
from cavlc_enc import encode_residual_block


def roundtrip(harness, coeffs, nc, max_coeffs):
    w = BitWriter()
    encode_residual_block(w, coeffs, nc, max_coeffs)
    nbits = w.bitpos
    w.byte_align_zero()
    data = w.rbsp() + b"\xff\xff\xff\xff"  # pad: decoder reads 32-bit words
    res = harness.cavlc(nc, max_coeffs, data)
    assert res is not None, f"oracle rejected nc={nc} coeffs={coeffs}"
    total_coeff, consumed, got = res
    want = list(coeffs) + [0] * (16 - len(coeffs))
    n_nonzero = sum(1 for c in coeffs if c)
    assert total_coeff == n_nonzero, (coeffs, nc, total_coeff)
    assert got == want, f"nc={nc} sent={want} got={got}"
    assert consumed == nbits, (coeffs, nc, consumed, nbits)


def gen_block(rng, max_coeffs, total_coeff, trailing_target, levels_pool):
    """Random scan-order coeff array with given total_coeff and an attempt
    at `trailing_target` trailing +/-1s."""
    positions = sorted(rng.sample(range(max_coeffs), total_coeff))
    coeffs = [0] * max_coeffs
    for k, p in enumerate(positions):
        from_end = total_coeff - 1 - k
        if from_end < trailing_target:
            coeffs[p] = rng.choice([1, -1])
        else:
            v = rng.choice(levels_pool)
            coeffs[p] = v
    return coeffs


def test_all_coeff_token_entries(harness):
    rng = random.Random(1234)
    pools = [[2, -2, 3, -3], [5, -7, 16, -16], [40, -100, 500, -900]]
    for nc in (-1, 0, 1, 2, 3, 4, 7, 8, 16):
        max_coeffs = 4 if nc == -1 else 16
        for tc in range(0, max_coeffs + 1):
            for to in range(0, min(tc, 3) + 1):
                for pool in pools:
                    coeffs = gen_block(rng, max_coeffs, tc, to, pool)
                    roundtrip(harness, coeffs, nc, max_coeffs)


def test_total_zeros_all_values(harness):
    # For each total_coeff, sweep every legal total_zeros by pinning the
    # last nonzero position.
    rng = random.Random(99)
    for nc in (0, 2):
        for tc in range(1, 16):
            for tz in range(0, 16 - tc + 1):
                last = tz + tc - 1
                positions = sorted(rng.sample(range(last), tc - 1)) + [last]
                coeffs = [0] * 16
                for p in positions:
                    coeffs[p] = rng.choice([1, -1, 2, -5])
                roundtrip(harness, coeffs, nc, 16)
    # chroma DC
    for tc in range(1, 5):
        for tz in range(0, 4 - tc + 1):
            last = tz + tc - 1
            positions = list(range(tc - 1)) + [last]
            coeffs = [0] * 4
            for p in positions:
                coeffs[p] = 1
            roundtrip(harness, coeffs, -1, 4)


def test_max_coeffs_15_ac_blocks(harness):
    rng = random.Random(5)
    for tc in range(0, 16):
        coeffs = gen_block(rng, 15, tc, rng.randint(0, 3), [1, -2, 9, -30])
        roundtrip(harness, coeffs, rng.choice([0, 2, 4, 8]), 15)


def test_level_escapes_and_suffix_adaptation(harness):
    # Large levels force prefix-14 / prefix-15 escapes and walk
    # suffixLength through all values 1..6.
    cases = [
        [14, 0, 0, 0],            # suffixLength 0, prefix-14 path
        [17, 0, 0, 0],            # suffixLength 0, 4-bit suffix edge
        [31, 0, 0, 0],            # escape at suffixLength 0
        [900, 0, 0, 0],
        [-1030, 0, 0, 0],
        [2, 900, -900, 500, 100, 17, -3, 2, 1, -1],
        [1000, -1000, 1000, -1000, 1000, -1000, 1000, -1000],
        [1, 1, 1, 48, 96, 192, 384, 768, 1, -1, 1],
    ]
    for coeffs in cases:
        for nc in (0, 4):
            roundtrip(harness, coeffs + [0] * (16 - len(coeffs)), nc, 16)


def test_fuzz_random_blocks(harness):
    rng = random.Random(42)
    for _ in range(600):
        nc = rng.choice([-1, 0, 1, 2, 3, 4, 5, 6, 7, 8, 12, 16])
        max_coeffs = 4 if nc == -1 else rng.choice([15, 16])
        tc = rng.randint(0, max_coeffs)
        coeffs = gen_block(rng, max_coeffs, tc, rng.randint(0, 3),
                           [1, -1, 2, -2, 3, -4, 7, -11, 30, -60, 250, -800])
        roundtrip(harness, coeffs, nc, max_coeffs)

"""Golden tests for inter prediction: P frames, quarter-pel MC, skip,
partitions, multi-ref."""

import streams
from test_golden_intra import golden_compare


def test_p_16x16_skip(oracle_dectest, tmp_path):
    data, _ = streams.inter_stream(n_frames=4, seed=101, p8x8=False,
                                   intra_in_p=False, mvd_range=12)
    golden_compare(tmp_path, oracle_dectest, data, "p16")


def test_p_partitions(oracle_dectest, tmp_path):
    data, _ = streams.inter_stream(n_frames=5, seed=102, mvd_range=24)
    golden_compare(tmp_path, oracle_dectest, data, "ppart")


def test_p_large_mv_edge_extension(oracle_dectest, tmp_path):
    data, _ = streams.inter_stream(n_frames=4, seed=103, mvd_range=90,
                                   width_mbs=4, height_mbs=3)
    golden_compare(tmp_path, oracle_dectest, data, "pedge")


def test_p_multi_ref(oracle_dectest, tmp_path):
    data, _ = streams.inter_stream(n_frames=8, seed=104, num_ref_frames=3,
                                   multi_ref_idx=True)
    golden_compare(tmp_path, oracle_dectest, data, "pmref")

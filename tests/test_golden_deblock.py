"""Golden tests with the in-loop deblocking filter enabled."""

import streams
from test_golden_intra import golden_compare


def test_deblock_ipcm(oracle_dectest, tmp_path):
    data, _ = streams.ipcm_stream(deblock=True)
    golden_compare(tmp_path, oracle_dectest, data, "dbpcm")


def test_deblock_intra_mixed(oracle_dectest, tmp_path):
    data, _ = streams.intra_mixed_stream(deblock=True, seed=55)
    golden_compare(tmp_path, oracle_dectest, data, "dbimix")


def test_deblock_intra_qps(oracle_dectest, tmp_path):
    for qp, seed in ((12, 61), (37, 62), (46, 63)):
        data, _ = streams.intra_mixed_stream(width_mbs=3, height_mbs=3,
                                             n_frames=2, seed=seed, qp=qp,
                                             deblock=True)
        golden_compare(tmp_path, oracle_dectest, data, f"dbq{qp}")


def test_deblock_inter(oracle_dectest, tmp_path):
    data, _ = streams.inter_stream(n_frames=5, seed=71, deblock=True)
    golden_compare(tmp_path, oracle_dectest, data, "dbinter")


def test_deblock_inter_multi_ref(oracle_dectest, tmp_path):
    data, _ = streams.inter_stream(n_frames=7, seed=72, num_ref_frames=2,
                                   multi_ref_idx=True, deblock=True,
                                   mvd_range=30)
    golden_compare(tmp_path, oracle_dectest, data, "dbmref")

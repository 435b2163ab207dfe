"""Golden tests: multi-slice pictures and FMO slice groups."""

import pytest

import streams
from test_golden_intra import golden_compare


def test_multislice(oracle_dectest, tmp_path):
    data, _ = streams.multislice_stream()
    golden_compare(tmp_path, oracle_dectest, data, "msl")


def test_multislice_deblock_idc2(oracle_dectest, tmp_path):
    data, _ = streams.multislice_stream(seed=202, deblock_idc=2,
                                        alpha_off=4, beta_off=-2)
    golden_compare(tmp_path, oracle_dectest, data, "mslidc2")


def test_multislice_deblock_offsets(oracle_dectest, tmp_path):
    data, _ = streams.multislice_stream(seed=203, deblock_idc=0,
                                        alpha_off=-6, beta_off=6,
                                        chroma_qp_offset=5)
    golden_compare(tmp_path, oracle_dectest, data, "msloff")


@pytest.mark.parametrize("map_type", [0, 1, 2, 3, 4, 5, 6])
def test_fmo(oracle_dectest, tmp_path, map_type):
    data, _ = streams.fmo_stream(map_type=map_type, seed=300 + map_type)
    golden_compare(tmp_path, oracle_dectest, data, f"fmo{map_type}")

"""Golden tests: frame_num gaps (non-existing frames) and long-term
references (MMCO 2/4/6, reorder to long-term)."""

import streams
from test_golden_intra import golden_compare


def test_frame_num_gaps(oracle_dectest, tmp_path):
    data, _ = streams.gaps_stream()
    golden_compare(tmp_path, oracle_dectest, data, "gaps")


def test_long_term_refs(oracle_dectest, tmp_path):
    data, _ = streams.long_term_stream()
    golden_compare(tmp_path, oracle_dectest, data, "lt")

"""Per-picture front-end: drives slice-data parsing over all slices of an
access unit, producing a complete PictureData tensor bundle.

Reference: h264bsd_slice_data.c:85 h264bsdDecodeSliceData (MB loop
:130-223, skip-run handling :148, SetMbParams :257).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .bitreader import BitReader, StreamError
from .mb_layer import (MB_P, MbParser, PictureData, SliceParams,
                       parse_macroblock, parse_p_skip)
from .params import Pps, Sps
from .slice_group_map import next_mb_address
from .slice_header import P_SLICE, SliceHeader


class SliceDataError(StreamError):
    """Raised mid-slice; carries how many MBs decoded for concealment."""

    def __init__(self, msg: str, last_addr: int = -1) -> None:
        super().__init__(msg)
        self.last_addr = last_addr


def decode_slice_data(r: BitReader, pic: PictureData, parser: MbParser,
                      header: SliceHeader, sps: Sps, pps: Pps,
                      sg_map: np.ndarray, slice_id: int,
                      ref_slots: List[int]) -> int:
    """Parse the slice_data() of one slice into `pic`. Returns the number
    of MBs decoded by this slice."""
    pic.slice_params.append(SliceParams(
        slice_type=header.slice_type,
        disable_deblocking_idc=header.disable_deblocking_idc,
        alpha_c0_offset=header.alpha_c0_offset,
        beta_offset=header.beta_offset,
        ref_slots=list(ref_slots)))
    assert len(pic.slice_params) == slice_id + 1

    addr = header.first_mb
    qp = header.slice_qp
    is_p = header.slice_type == P_SLICE
    num_ref = header.num_ref_idx_l0
    n_decoded = 0
    more = True

    ref_slot0 = ref_slots[0] if ref_slots else -1

    while more:
        if addr < 0:
            raise SliceDataError("slice overruns picture", addr)
        if is_p:
            skip_run = r.ue()
            if skip_run > pic.n_mbs:
                raise SliceDataError("invalid mb_skip_run", addr)
            for _ in range(skip_run):
                if addr < 0:
                    raise SliceDataError("skip run overruns picture", addr)
                if pic.decoded[addr]:
                    raise SliceDataError("MB decoded twice", addr)
                pic.slice_id[addr] = slice_id
                parse_p_skip(parser, addr, ref_slot0)
                pic.qp[addr] = qp
                n_decoded += 1
                addr = next_mb_address(sg_map, addr)
            more = r.more_rbsp_data()
            if not more:
                break
        if addr < 0:
            raise SliceDataError("slice overruns picture", addr)
        if pic.decoded[addr]:
            raise SliceDataError("MB decoded twice", addr)
        pic.slice_id[addr] = slice_id
        qp = parse_macroblock(r, parser, addr, header.slice_type, qp,
                              num_ref, ref_slots, pps.chroma_qp_index_offset)
        n_decoded += 1
        addr = next_mb_address(sg_map, addr)
        more = r.more_rbsp_data()
    return n_decoded

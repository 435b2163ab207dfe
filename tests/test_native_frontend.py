"""Native (C++) front-end vs Python front-end: identical PictureData and
identical decoded output on every stream scenario."""

import numpy as np
import pytest

import streams
from broadway_tpu.bitstream import native as nat
from broadway_tpu.core.decoder import Decoder


pytestmark = pytest.mark.skipif(not nat.available(),
                                reason="native front-end not built")


def both(data):
    a = Decoder(frontend="python").decode_annexb(data)
    b = Decoder(frontend="native").decode_annexb(data)
    assert len(a) == len(b)
    for i, (x, y) in enumerate(zip(a, b)):
        if x.frame.tobytes() != y.frame.tobytes():
            xa = np.frombuffer(x.frame.tobytes(), np.uint8)
            yb = np.frombuffer(y.frame.tobytes(), np.uint8)
            off = int(np.nonzero(xa != yb)[0][0])
            raise AssertionError(f"frame {i} differs at byte {off}")


def test_native_intra():
    both(streams.intra_mixed_stream(seed=951, deblock=True)[0])


def test_native_inter():
    both(streams.inter_stream(n_frames=6, seed=952, deblock=True,
                              num_ref_frames=2, multi_ref_idx=True)[0])


def test_native_multislice():
    both(streams.multislice_stream(seed=953)[0])


def test_native_fmo():
    both(streams.fmo_stream(map_type=1, seed=954)[0])


def test_native_qp_extremes():
    for qp in (0, 12, 51):
        both(streams.intra_mixed_stream(width_mbs=3, height_mbs=3,
                                        n_frames=2, seed=955 + qp,
                                        qp=qp)[0])


def test_native_conceal_truncated():
    from test_golden_conceal import truncate_nal
    data, _ = streams.inter_stream(n_frames=5, seed=956, deblock=True)
    both(truncate_nal(data, 4, 0.4))


def test_native_pcm():
    both(streams.ipcm_stream()[0])

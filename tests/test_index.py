"""The "ix" block-length sidecar: fully-device decode + legacy compatibility."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu.constants import Mode

from . import corpus, refqb3

pytestmark = pytest.mark.skipif(not refqb3.available(), reason="oracle not built")


@pytest.mark.parametrize("mode", [Mode.FTL, Mode.BASE_H])
def test_indexed_roundtrip(mode):
    img = corpus.natural8(48, 40, 3, seed=120)
    s = qb3_tpu.encode(img, mode=mode, index=True)
    dec, info = qb3_tpu.decode(s)
    assert info.index is not None
    np.testing.assert_array_equal(dec, img)


def test_reference_skips_index_chunk():
    img = corpus.natural8(64, 64, 1, seed=121)
    s = qb3_tpu.encode(img, mode=Mode.FTL, index=True)
    dec, _ = refqb3.ref_decode(s)
    np.testing.assert_array_equal(dec, img)


def test_indexed_payload_matches_plain():
    img = corpus.natural8(32, 32, 1, seed=122)
    plain = qb3_tpu.encode(img, mode=Mode.FTL)
    idx = qb3_tpu.encode(img, mode=Mode.FTL, index=True)
    # identical entropy payload, only extra header chunk(s)
    from qb3_tpu import container
    pi = container.parse_headers(plain)
    ii = container.parse_headers(idx)
    assert plain[pi.data_offset:] == idx[ii.data_offset:]


def test_indexed_wide_types():
    img = corpus.to_type(corpus.natural8(32, 32, 1, seed=123), np.uint64, 1 << 56)
    s = qb3_tpu.encode(img, mode=Mode.FTL, index=True)
    dec, _ = qb3_tpu.decode(s)
    np.testing.assert_array_equal(dec, img)


def test_large_index_multi_chunk():
    # > 65530 bytes of index: 512x512x3 -> 49152 groups * 3 bands... use u16
    img = corpus.natural8(512, 512, 3, seed=124)
    s = qb3_tpu.encode(img, mode=Mode.FTL, index=True)
    from qb3_tpu import container
    info = container.parse_headers(s)
    assert len(info.index) == 2 * (128 * 128) * 3
    dec, _ = qb3_tpu.decode(s)
    np.testing.assert_array_equal(dec, img)
    dec2, _ = refqb3.ref_decode(s)
    np.testing.assert_array_equal(dec2, img)

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


# ---------------------------------------------------------------- "ib" sidecar

@pytest.mark.parametrize("mode", [Mode.CF_H, Mode.CF])
def test_best_sidecar_roundtrip(mode):
    img = corpus.natural8(48, 40, 3, seed=130)
    s = qb3_tpu.encode(img, mode=mode, index=True)
    from qb3_tpu import container
    info = container.parse_headers(s)
    assert info.index_best is not None and info.index is None
    dec, _ = qb3_tpu.decode(s)
    np.testing.assert_array_equal(dec, img)
    # the entropy payload is unchanged by the sidecar
    plain = qb3_tpu.encode(img, mode=mode)
    pi = container.parse_headers(plain)
    assert plain[pi.data_offset:] == s[info.data_offset:]
    # legacy readers skip the chunk
    rdec, _ = refqb3.ref_decode(s)
    np.testing.assert_array_equal(rdec, img)


def test_best_sidecar_cf_heavy():
    # x5 plants a common factor in every group (test_qb3.cpp:675-685)
    img = corpus.to_type(corpus.natural8(40, 40, 2, seed=131), np.uint16, 5)
    s = qb3_tpu.encode(img, mode=Mode.CF_H, index=True)
    dec, _ = qb3_tpu.decode(s)
    np.testing.assert_array_equal(dec, img)


def test_best_sidecar_u64_high_rung():
    img = corpus.to_type(corpus.natural8(32, 32, 1, seed=132), np.uint64, 1 << 56)
    s = qb3_tpu.encode(img, mode=Mode.CF_H, index=True)
    from qb3_tpu import container
    info = container.parse_headers(s)
    dec, _ = qb3_tpu.decode(s)
    np.testing.assert_array_equal(dec, img)


def test_best_sidecar_large_cf_falls_back():
    # CF - 2 > 0xFFFF: no sidecar is written, decode falls back to the walk
    img = corpus.to_type(corpus.natural8(16, 16, 1, seed=133), np.uint32, 1 << 20)
    s = qb3_tpu.encode(img, mode=Mode.CF_H, index=True)
    from qb3_tpu import container
    info = container.parse_headers(s)
    assert info.index_best is None
    dec, _ = qb3_tpu.decode(s)
    np.testing.assert_array_equal(dec, img)


def test_best_sidecar_with_rle():
    # CF_RLE_H: the sidecar describes the pre-RLE payload
    img8 = corpus.natural8(40, 40, 1, seed=134)
    img8[5:30, 5:30] = 77  # constant region -> zero runs for RLE
    s = qb3_tpu.encode(img8, mode=Mode.CF_RLE_H, index=True)
    dec, _ = qb3_tpu.decode(s)
    np.testing.assert_array_equal(dec, img8)
    rdec, _ = refqb3.ref_decode(s)
    np.testing.assert_array_equal(rdec, img8)


def test_best_sidecar_index_groups():
    # few-unique data in high rungs exercises the IDX kind in the sidecar
    rng = np.random.default_rng(135)
    vals = np.array([0, 1 << 12, 3 << 12, 7 << 12], np.uint16)
    img = vals[rng.integers(0, 4, size=(32, 32, 1))]
    s = qb3_tpu.encode(img, mode=Mode.CF_H, index=True)
    dec, _ = qb3_tpu.decode(s)
    np.testing.assert_array_equal(dec, img)
    rdec, _ = refqb3.ref_decode(s)
    np.testing.assert_array_equal(rdec, img)

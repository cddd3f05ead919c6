"""Extra StripDecoder coverage (foreign streams, RLE, many strips) on top
of test_strip.py's basics."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu import StripDecoder
from qb3_tpu.constants import Mode

from . import corpus, refqb3


def _check(stream, img, strip_rows=16):
    sd = StripDecoder(stream, strip_rows=strip_rows)
    rows = []
    while (s := sd.read()) is not None:
        rows.append(s)
    got = np.concatenate(rows, axis=0)
    np.testing.assert_array_equal(got.reshape(img.shape), img)
    assert max(s.shape[0] for s in rows) <= max(strip_rows, 2 * 4)


@pytest.mark.parametrize("mode,index", [
    (Mode.FTL, True), (Mode.FTL, "ic"), (Mode.FTL, False),
    (Mode.BASE_H, True), (Mode.CF_H, True), (Mode.CF_H, "ic"),
])
def test_strip_decode_tall(mode, index):
    img = corpus.natural8(96, 64, 3, seed=5)  # > 4 strips at 16 rows
    stream = qb3_tpu.encode(img, mode=mode, index=index)
    _check(stream, img)


def test_strip_decode_u16_and_unaligned_height():
    img = corpus.natural8(70, 64, 2, seed=6).astype(np.uint16) * np.uint16(257)
    stream = qb3_tpu.encode(img, mode=Mode.FTL, index=True)
    _check(stream, img, strip_rows=24)


def test_strip_decode_quanta():
    img = corpus.natural8(64, 64, 1, seed=8)
    stream = qb3_tpu.encode(img, mode=Mode.FTL, quanta=4, index=True)
    whole, _ = qb3_tpu.decode(stream)
    sd = StripDecoder(stream, strip_rows=16)
    rows = []
    while (s := sd.read()) is not None:
        rows.append(s)
    got = np.concatenate(rows, axis=0)
    np.testing.assert_array_equal(got.reshape(whole.shape), whole)


@pytest.mark.skipif(not refqb3.available(), reason="oracle missing")
def test_strip_decode_foreign_stream():
    """Reference-encoded (sidecar-free) streams decode strip-wise via the
    serial walk."""
    img = corpus.natural8(80, 64, 3, seed=9)
    stream = refqb3.ref_encode(img, mode=8)
    _check(stream, img)


def test_strip_decode_rle_mode():
    img = np.zeros((64, 64, 1), np.uint8)
    img[10:20, 10:30, 0] = 3
    stream = qb3_tpu.encode(img, mode=Mode.RLE_H, index=True)
    _check(stream, img)

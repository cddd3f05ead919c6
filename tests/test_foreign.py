"""Bulk foreign-stream decode (qb3_tpu/foreign.py): streams encoded by the
REFERENCE library, no sidecar, decoded thread-walk + one device dispatch."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu import native
from qb3_tpu.foreign import decode_streams, decode_streams_pipelined

from . import corpus, refqb3

pytestmark = pytest.mark.skipif(
    not (refqb3.available() and native.available()),
    reason="needs reference oracle + native walk")


def _ref_streams(n, mode, seed=0, h=64, w=64, c=3):
    imgs = [corpus.natural8(h, w, c, seed=seed + i) for i in range(n)]
    return imgs, [refqb3.ref_encode(im, mode=mode) for im in imgs]


@pytest.mark.parametrize("mode", [8, 4, 7])  # FTL, BASE, BEST
def test_bulk_foreign_roundtrip(mode):
    imgs, streams = _ref_streams(5, mode, seed=mode * 10)
    out, np_dt = decode_streams(streams)
    arr = np.asarray(out).view(np_dt)
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(arr[i], im)


def test_bulk_foreign_pipelined():
    batches = []
    allimgs = []
    for b in range(3):
        imgs, streams = _ref_streams(3, 8, seed=100 + 10 * b)
        batches.append(streams)
        allimgs.append(imgs)
    for dec, imgs in zip(decode_streams_pipelined(iter(batches)), allimgs):
        for i, im in enumerate(imgs):
            np.testing.assert_array_equal(dec[i], im)


def test_bulk_foreign_rejects_mixed():
    from qb3_tpu.errors import QB3ShapeError

    _, s1 = _ref_streams(1, 8, seed=1)
    _, s2 = _ref_streams(1, 8, seed=2, h=32)
    with pytest.raises(QB3ShapeError):
        decode_streams([s1[0], s2[0]])

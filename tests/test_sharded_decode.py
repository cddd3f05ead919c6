"""Mesh-sharded decode of indexed streams."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu.constants import Mode
from qb3_tpu.parallel.sharded import decode_fast_sharded

from . import corpus


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_decode_u8(n_dev):
    img = corpus.natural8(32 * n_dev, 64, 3, seed=300 + n_dev)
    s = qb3_tpu.encode(img, mode=Mode.FTL, index=True)
    out = decode_fast_sharded(s, n_dev)
    np.testing.assert_array_equal(out, img)


def test_sharded_decode_u16_base():
    img = corpus.to_type(corpus.natural8(64, 48, 2, seed=310), np.uint16, 257)
    s = qb3_tpu.encode(img, mode=Mode.BASE_H, index=True)
    out = decode_fast_sharded(s, 4)
    np.testing.assert_array_equal(out, img)


def test_sharded_decode_u64():
    img = corpus.to_type(corpus.natural8(64, 32, 1, seed=311), np.uint64, 1 << 40)
    s = qb3_tpu.encode(img, mode=Mode.FTL, index=True)
    out = decode_fast_sharded(s, 8)
    np.testing.assert_array_equal(out, img)

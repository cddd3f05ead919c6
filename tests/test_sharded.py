"""Sharded (multi-device) encode must be byte-exact with single-device."""

import jax
import numpy as np
import pytest

import qb3_tpu
from qb3_tpu import container
from qb3_tpu.constants import Mode
from qb3_tpu.parallel.sharded import encode_fast_sharded

from . import corpus


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_ftl_byte_exact(n_dev):
    assert len(jax.devices()) >= n_dev
    img = corpus.natural8(32 * n_dev, 64, 1, seed=100 + n_dev)
    single = qb3_tpu.encode(img, mode=Mode.FTL)
    info = container.parse_headers(single)
    payload, totals = encode_fast_sharded(img, n_dev, cband=(0,))
    assert payload == single[info.data_offset:], (
        f"sharded payload differs (lens {totals.tolist()})")


def test_sharded_rgb():
    img = corpus.natural8(64, 48, 3, seed=110)
    single = qb3_tpu.encode(img, mode=Mode.FTL, coreband=[1, 1, 1])
    info = container.parse_headers(single)
    payload, _ = encode_fast_sharded(img, 4, cband=(1, 1, 1))
    assert payload == single[info.data_offset:]


def test_sharded_u64():
    img = corpus.to_type(corpus.natural8(64, 32, 1, seed=111), np.uint64, 1 << 40)
    single = qb3_tpu.encode(img, mode=Mode.FTL)
    info = container.parse_headers(single)
    payload, _ = encode_fast_sharded(img, 8, cband=(0,))
    assert payload == single[info.data_offset:]

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


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_decode_ib_best(n_dev):
    img = corpus.natural8(32 * n_dev, 32, 3, seed=320 + n_dev)
    s = qb3_tpu.encode(img, mode=Mode.CF_H, index=True)
    out = decode_fast_sharded(s, n_dev)
    np.testing.assert_array_equal(out, img)


def test_sharded_decode_ib_u64():
    img = corpus.to_type(corpus.natural8(64, 32, 1, seed=321), np.uint64, 5)
    s = qb3_tpu.encode(img, mode=Mode.CF_H, index=True)
    out = decode_fast_sharded(s, 4)
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_decode_ic(n_dev):
    # ic chunks (K=8 blocks) must split evenly: H/4/n_dev rows of W/4 blocks
    img = corpus.natural8(16 * n_dev, 128, 3, seed=330 + n_dev)
    s = qb3_tpu.encode(img, mode=Mode.FTL, index="ic")
    out = decode_fast_sharded(s, n_dev)
    np.testing.assert_array_equal(out, img)


def test_sharded_decode_ic_u16_base():
    img = corpus.to_type(corpus.natural8(32, 128, 2, seed=331), np.uint16, 257)
    s = qb3_tpu.encode(img, mode=Mode.BASE_H, index="ic")
    out = decode_fast_sharded(s, 2)
    np.testing.assert_array_equal(out, img)


def test_scatter_stitch_encode():
    from qb3_tpu.parallel.sharded import (encode_fast_sharded,
                                          encode_fast_sharded_scatter)

    img = corpus.natural8(64, 48, 3, seed=340)
    p1, _ = encode_fast_sharded(img, 8, cband=(1, 1, 1))
    p2, _ = encode_fast_sharded_scatter(img, 8, cband=(1, 1, 1))
    assert p1 == p2


def test_scatter_stitch_zero_own_shards():
    """Shards owning zero whole output words (tiny, highly compressible
    strips) must still contribute their bits: the shared boundary word is
    OR-combined host-side (stitch.py assemble_scatter), not chained through
    a one-hop ppermute that drops multi-shard overlaps."""
    from qb3_tpu.parallel.sharded import (encode_fast_sharded,
                                          encode_fast_sharded_scatter)

    rng = np.random.default_rng(341)
    for trial in range(6):
        img = (rng.integers(0, 2, (32, 4, 1)) * 255).astype(np.uint8)
        p1, _ = encode_fast_sharded(img, 8)
        p2, _ = encode_fast_sharded_scatter(img, 8)
        assert p1 == p2, f"trial {trial}"


def test_sharded_decode_ic_unaligned_chunks():
    """Chunk anchors (K=8 blocks) need not align with shard boundaries:
    a 32x20x1 image over 8 devices puts 20 blocks (2.5 chunks) per shard —
    every strip starts mid-chunk except the first."""
    img = corpus.natural8(32, 80, 1, seed=350)
    s = qb3_tpu.encode(img, mode=Mode.FTL, index="ic")
    out = decode_fast_sharded(s, 8)
    np.testing.assert_array_equal(out, img)


def test_sharded_decode_ic_unaligned_chunks_k3():
    from qb3_tpu.api import DT_FROM_NP, Encoder

    img = corpus.natural8(48, 52, 3, seed=351)
    e = Encoder(52, 48, 3, DT_FROM_NP[img.dtype])
    e.set_mode(Mode.FTL)
    e.with_index = "ic"
    e.index_chunk_blocks = 3
    s = e.encode(img)
    out = decode_fast_sharded(s, 4)
    np.testing.assert_array_equal(out, img)

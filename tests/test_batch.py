"""Batched tile encode/decode: per-tile streams identical to standalone."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu.batch import decode_tiles, encode_tiles
from qb3_tpu.constants import Mode

from . import corpus, refqb3

pytestmark = pytest.mark.skipif(not refqb3.available(), reason="oracle not built")


def test_batch_matches_standalone():
    tiles = np.stack([corpus.natural8(32, 32, 3, seed=200 + i) for i in range(4)])
    streams = encode_tiles(tiles, mode=Mode.FTL)
    for i, s in enumerate(streams):
        assert s == qb3_tpu.encode(tiles[i], mode=Mode.FTL)


def test_batch_roundtrip_landsat_shape():
    # 8-band 16-bit tiles (the web-demo data shape, BASELINE config 4)
    rng = np.random.default_rng(201)
    base = np.stack([
        corpus.to_type(corpus.natural8(64, 64, 8, seed=210 + i), np.uint16, 257)
        for i in range(6)])
    streams = encode_tiles(base, mode=Mode.FTL, index=True)
    dec = decode_tiles(streams)
    np.testing.assert_array_equal(dec, base)
    # NB: the reference decoder cannot read identity-coreband multiband
    # streams (REFERENCE_BUGS.md #3) — even its own. Verify our streams are
    # byte-identical to reference-encoded ones instead.
    for i, s in enumerate(streams):
        assert refqb3.ref_encode(base[i], mode=8) == qb3_tpu.encode(base[i], mode=8)


def test_batch_base_mode():
    tiles = np.stack([corpus.natural8(32, 32, 1, seed=220 + i) for i in range(3)])
    streams = encode_tiles(tiles, mode=Mode.BASE_H, index=True)
    dec = decode_tiles(streams)
    np.testing.assert_array_equal(dec, tiles)


def test_batch_best_mode_roundtrip():
    """Best-mode tiles per dispatch: streams byte-exact with standalone
    encodes; ib-sidecar batch decode recovers the tiles."""
    from qb3_tpu.batch import decode_tiles, encode_tiles

    tiles = np.stack([corpus.natural8(32, 32, 3, seed=170 + i) for i in range(4)])
    tiles[0] = (tiles[0] // 5) * 5  # CF-heavy tile
    streams = encode_tiles(tiles, mode=Mode.CF_H, index=True)
    for i in range(4):
        assert streams[i].startswith(
            qb3_tpu.encode(tiles[i], mode=Mode.CF_H)[:1])
        single = qb3_tpu.encode(tiles[i], mode=Mode.CF_H, index="ib")
        assert streams[i] == single, f"tile {i}"
    out = decode_tiles(streams)
    np.testing.assert_array_equal(out, tiles)


def test_batch_ic_roundtrip():
    """Batched self-contained tiles: per-tile streams identical to the
    standalone ic encode; one flat chunk-walk dispatch decodes the batch."""
    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.batch import decode_tiles, encode_tiles

    tiles = np.stack([corpus.natural8(64, 64, 3, seed=60 + i)
                      for i in range(4)])
    streams = encode_tiles(tiles, mode=Mode.FTL, index="ic")
    assert all(container.parse_headers(s).index_chunked is not None
               for s in streams)
    assert streams[0] == qb3_tpu.encode(tiles[0], mode=Mode.FTL, index="ic")
    np.testing.assert_array_equal(decode_tiles(streams), tiles)


def test_batch_ic_base_mode():
    from qb3_tpu.batch import decode_tiles, encode_tiles

    tiles = np.stack([corpus.natural8(48, 64, 1, seed=70 + i)
                      for i in range(3)])
    streams = encode_tiles(tiles, mode=Mode.BASE_H, index="ic")
    np.testing.assert_array_equal(decode_tiles(streams), tiles)

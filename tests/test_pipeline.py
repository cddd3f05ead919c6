"""Pipelined host-to-host serving API (qb3_tpu/pipeline.py): streams must
be byte-identical to the one-shot encoder, across the double-buffer
boundary and the adaptive fetch-cap fallback."""

import numpy as np

import qb3_tpu
from qb3_tpu.constants import Mode
from qb3_tpu.pipeline import decode_tiles_pipelined, encode_tiles_pipelined

from . import corpus


def _batches(nb, n, h=64, w=64, c=3, seed=0):
    return [np.stack([corpus.natural8(h, w, c, seed=seed + 10 * b + i)
                      for i in range(n)]) for b in range(nb)]


def test_encode_pipelined_matches_oneshot():
    batches = _batches(3, 4)
    outs = list(encode_tiles_pipelined(iter(batches), index="ic"))
    assert len(outs) == 3
    for streams, tiles in zip(outs, batches):
        for s, t in zip(streams, tiles):
            assert s == qb3_tpu.encode(t, mode=Mode.FTL, index="ic")


def test_roundtrip_pipelined():
    batches = _batches(3, 4, seed=50)
    streams = list(encode_tiles_pipelined(iter(batches), index="ic"))
    decs = list(decode_tiles_pipelined(iter(streams)))
    for d, b in zip(decs, batches):
        np.testing.assert_array_equal(d, b)


def test_roundtrip_pipelined_ix():
    batches = _batches(2, 3, seed=70)
    streams = list(encode_tiles_pipelined(iter(batches), index=True))
    decs = list(decode_tiles_pipelined(iter(streams)))
    for d, b in zip(decs, batches):
        np.testing.assert_array_equal(d, b)


def test_fetch_cap_fallback():
    """Batch 2 compresses far worse than batch 1: the adaptive fetch cap
    learned from batch 1 must fall back to the retained full buffer."""
    rng = np.random.default_rng(3)
    smooth = np.stack([np.zeros((64, 64, 1), np.uint8) for _ in range(2)])
    # noisy-but-compressible (stored fallback not taken, ratio ~100%)
    noisy = np.stack([
        (rng.integers(0, 2, (64, 64, 1)) * 120 + rng.integers(0, 60, (64, 64, 1))
         ).astype(np.uint8) for _ in range(2)])
    batches = [smooth, noisy, smooth]
    outs = list(encode_tiles_pipelined(iter(batches), index="ic"))
    for streams, tiles in zip(outs, batches):
        for s, t in zip(streams, tiles):
            dec, _ = qb3_tpu.decode(s)
            np.testing.assert_array_equal(dec.reshape(t.shape), t)


def test_roundtrip_pipelined_ib():
    """Best-mode streams with the ib sidecar flow through the pipelined
    decoder (ADVICE r4: the branch existed only in batch.decode_tiles)."""
    from qb3_tpu.batch import encode_tiles

    batches = [[corpus.natural8(64, 64, 3, seed=90 + 10 * b + i)
                for i in range(3)] for b in range(2)]
    streams = [encode_tiles(np.stack(tiles), mode=Mode.CF_H, index=True)
               for tiles in batches]
    decs = list(decode_tiles_pipelined(iter(streams)))
    for d, tiles in zip(decs, batches):
        np.testing.assert_array_equal(d, np.stack(tiles))


def test_pipelined_rejects_mixed_shapes():
    import pytest

    from qb3_tpu.errors import QB3ShapeError

    a = qb3_tpu.encode(corpus.natural8(64, 64, 3, seed=1), index=True)
    b = qb3_tpu.encode(corpus.natural8(32, 64, 3, seed=2), index=True)
    with pytest.raises(QB3ShapeError):
        list(decode_tiles_pipelined(iter([[a, b]])))


def test_pipelined_rejects_missing_sidecar():
    import pytest

    from qb3_tpu.errors import QB3ShapeError

    s = qb3_tpu.encode(corpus.natural8(64, 64, 3, seed=3))  # no sidecar
    with pytest.raises(QB3ShapeError):
        list(decode_tiles_pipelined(iter([[s]])))

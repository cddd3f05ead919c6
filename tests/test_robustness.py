"""Corrupt/hostile input handling: errors, never crashes or hangs."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu.constants import Mode

from . import corpus


def _expect_error_or_garbage(stream, img):
    """A corrupted stream must either raise cleanly or decode to something
    (possibly wrong) of the right shape — matching the reference's
    best-effort semantics (QB3decode.h:577)."""
    try:
        out, _ = qb3_tpu.decode(stream)
        assert out.shape == img.shape
    except (ValueError, AssertionError):
        pass


@pytest.mark.parametrize("mode", [Mode.FTL, Mode.CF_H])
def test_bitflips(mode):
    img = corpus.natural8(32, 32, 1, seed=700)
    s = bytearray(qb3_tpu.encode(img, mode=mode))
    rng = np.random.default_rng(701)
    for _ in range(12):
        mut = bytearray(s)
        mut[rng.integers(14, len(s))] ^= 1 << rng.integers(0, 8)
        _expect_error_or_garbage(bytes(mut), img)


def test_truncations():
    img = corpus.natural8(32, 32, 1, seed=702)
    s = qb3_tpu.encode(img, mode=Mode.FTL)
    for frac in (0.3, 0.6, 0.9, 0.99):
        _expect_error_or_garbage(s[: int(len(s) * frac)], img)


def test_rle_bomb_guard():
    """Malicious RLE expansion beyond the image size must be rejected
    (QB3decode.cpp:399-404)."""
    img = np.zeros((64, 64, 1), np.uint8)
    s = bytes(qb3_tpu.encode(img, mode=Mode.RLE_H))
    info_end = s.index(b"DT") + 2
    bomb = b"\xff\xff\xfe" * 32  # expands to 32*258 = 8256 > 4096 bytes
    with pytest.raises((ValueError, AssertionError)):
        qb3_tpu.decode(s[:info_end] + bomb)


def test_header_fuzz():
    rng = np.random.default_rng(703)
    for _ in range(30):
        junk = bytes(rng.integers(0, 256, size=rng.integers(4, 60), dtype=np.uint8))
        try:
            qb3_tpu.decode(b"QB3\x80" + junk)
        except (ValueError, IndexError):
            pass

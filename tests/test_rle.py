"""RLE0 post-pass: python/native equivalence + roundtrip fuzz.

Byte-exactness of RLE-mode *streams* against the reference oracle is covered
by test_baseline_configs/test_decode; this file pins the two in-repo
implementations to each other and to the format's roundtrip property on
adversarial byte patterns (zero floods, 0xff floods, mixed escapes).
"""

import numpy as np
import pytest

import qb3_tpu.rle as R

try:
    import qb3_tpu.native as N
    HAVE_NATIVE = N.available()
except Exception:
    HAVE_NATIVE = False


def _patterns():
    rng = np.random.default_rng(7)
    for trial in range(400):
        n = int(rng.integers(0, 300))
        style = trial % 5
        if style == 0:
            buf = rng.integers(0, 256, n, dtype=np.uint8)
        elif style == 1:
            buf = rng.choice(np.array([0, 0, 0, 0, 0xFF, 0xFF, 1], np.uint8), n)
        elif style == 2:
            buf = np.zeros(n, np.uint8)
        elif style == 3:
            buf = np.full(n, 0xFF, np.uint8)
        else:
            buf = rng.choice(np.array([0, 0xFF], np.uint8), n)
        yield buf.tobytes()
    # long runs straddle the 258-zero chunk limit
    for n in (257, 258, 259, 300, 1000):
        yield bytes(n)
    # boundary shapes
    yield b"\xff\xff\x00"
    yield b"\xff\x00\x00\x00\x00\x00"
    yield b"\x00\x00\x00\x00\xff"


def test_roundtrip_python():
    for data in _patterns():
        enc = R._rle0_encode_py(data)
        assert R._rle0_decode_py(enc, len(data)) == data
        if len(data) >= 3:
            assert R.rle0_decoded_size(enc) == len(data)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native helper not built")
def test_native_matches_python():
    for data in _patterns():
        enc_py = R._rle0_encode_py(data)
        enc_nat = N.rle0_encode(data)
        assert enc_py == enc_nat
        assert N.rle0_decode(enc_nat, len(data)) == data
        if len(data) >= 3:
            assert N.rle0_size(enc_py) == len(data)


def test_decode_overflow_guard():
    # a run claiming more output than expected must raise, not overflow
    evil = b"\xff\xff\xf0" + b"x" * 8
    with pytest.raises(ValueError):
        R._rle0_decode_py(evil, 10)

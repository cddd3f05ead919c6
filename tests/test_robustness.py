"""Corrupt/hostile input handling: errors, never crashes or hangs.

The second half asserts accept/reject PARITY with the compiled reference:
our decoder must fail exactly when the reference fails (its `failed`
accumulation QB3decode.h:642-703 plus the >7-leftover-bits rule
QB3decode.h:411,:744), and accept — producing garbage — when it accepts.
"""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu.constants import Mode
from qb3_tpu.errors import QB3DataError, QB3Error

from . import corpus, refqb3


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


# ---------------------------------------------------------- reference parity

def _ref_accepts(stream):
    try:
        refqb3.ref_decode(stream)
        return True
    except AssertionError:
        return False


def _we_accept(stream):
    try:
        qb3_tpu.decode(stream)
        return True
    except QB3Error:
        return False


@pytest.mark.skipif(not refqb3.available(), reason="oracle not built")
@pytest.mark.parametrize("mode", [Mode.FTL, Mode.BASE_H, Mode.CF_H])
def test_bitflip_accept_parity(mode):
    """Flipping payload bits must be accepted/rejected exactly like the
    reference (no sidecar, so both sides run their serial-equivalent path)."""
    img = corpus.natural8(32, 32, 1, seed=710)
    s = qb3_tpu.encode(img, mode=mode)
    rng = np.random.default_rng(711)
    disagreements = []
    for _ in range(40):
        mut = bytearray(s)
        pos = int(rng.integers(s.index(b"DT") + 2, len(s)))
        mut[pos] ^= 1 << int(rng.integers(0, 8))
        mut = bytes(mut)
        ref, ours = _ref_accepts(mut), _we_accept(mut)
        if ref != ours:
            disagreements.append((pos, ref, ours))
    assert not disagreements, f"accept/reject mismatches: {disagreements}"


@pytest.mark.skipif(not refqb3.available(), reason="oracle not built")
def test_trailing_garbage_rejected():
    """>7 leftover bits fail on both sides (QB3decode.h:411)."""
    img = corpus.natural8(32, 32, 1, seed=712)
    s = qb3_tpu.encode(img, mode=Mode.FTL)
    for extra in (2, 16):
        mut = s + b"\x5a" * extra
        assert not _ref_accepts(mut)
        assert not _we_accept(mut)
    # but up to 7 bits of padding (the final partial byte) are fine
    assert _we_accept(s)


@pytest.mark.skipif(not refqb3.available(), reason="oracle not built")
def test_truncation_accept_parity():
    """The reference reads zeros past the end of truncated payloads and
    accepts them; so do we."""
    img = corpus.natural8(32, 32, 1, seed=713)
    s = qb3_tpu.encode(img, mode=Mode.FTL)
    for frac in (0.5, 0.9):
        mut = s[: int(len(s) * frac)]
        assert _ref_accepts(mut) == _we_accept(mut)


def test_partial_output():
    """read_data(partial=True) returns best-effort output + failed flag."""
    img = corpus.natural8(32, 32, 1, seed=714)
    s = qb3_tpu.encode(img, mode=Mode.FTL)
    mut = s + b"\xff" * 8  # trips the leftover rule
    dec = qb3_tpu.Decoder(mut)
    with pytest.raises(QB3DataError):
        dec.read_data()
    dec2 = qb3_tpu.Decoder(mut)
    out = dec2.read_data(partial=True)
    assert dec2.failed and out.shape == img.shape
    np.testing.assert_array_equal(out, img)  # prefix decodes correctly


def test_decode_path_observable():
    img = corpus.natural8(32, 32, 1, seed=715)
    for index, path in [(False, ("native-walk", "python-walk")),
                        (True, ("ix",)), ("ic", ("ic",))]:
        s = qb3_tpu.encode(img, mode=Mode.FTL, index=index)
        dec = qb3_tpu.Decoder(s)
        dec.read_data()
        assert dec.decode_path in path, (index, dec.decode_path)

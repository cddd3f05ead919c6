"""Decoder conformance: decode reference-encoded streams exactly, and
roundtrip our own streams across every mode/dtype/feature axis."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu.constants import Mode

from . import corpus, refqb3

pytestmark = pytest.mark.skipif(not refqb3.available(), reason="oracle not built")


def roundtrip(img, mode, quanta=1, away=False, coreband=None):
    """our encode -> our decode == identity; and our decode(ref stream)."""
    kw = dict(quanta=quanta, away=away, coreband=coreband)
    ours = qb3_tpu.encode(img, mode=mode, **kw)
    dec, info = qb3_tpu.decode(ours)
    ref = refqb3.ref_encode(img, mode=int(mode), **kw)
    ref_dec, _ = refqb3.ref_decode(ref)
    np.testing.assert_array_equal(dec, ref_dec, err_msg="self-roundtrip")
    dec2, _ = qb3_tpu.decode(ref)
    np.testing.assert_array_equal(dec2, ref_dec, err_msg="decoding ref stream")
    if quanta == 1:
        np.testing.assert_array_equal(dec, img)


@pytest.mark.parametrize("mode", [Mode.FTL, Mode.BASE_H, Mode.BASE_Z, Mode.CF_H, Mode.CF])
def test_modes_u8(mode):
    roundtrip(corpus.natural8(48, 40, 1, seed=70), mode)


@pytest.mark.parametrize("mode", [Mode.FTL, Mode.CF_H])
def test_rgb(mode):
    roundtrip(corpus.natural8(40, 56, 3, seed=71), mode)


@pytest.mark.parametrize("dtype,mult", [
    (np.uint16, 257), (np.uint32, 65537), (np.uint64, 1 << 40), (np.uint64, 1 << 56),
])
def test_wide_types(dtype, mult):
    img = corpus.to_type(corpus.natural8(32, 32, 1, seed=72), dtype, mult)
    roundtrip(img, Mode.FTL)
    roundtrip(img, Mode.CF_H)


@pytest.mark.parametrize("dtype", [np.int8, np.int16, np.int64])
def test_signed(dtype):
    img = (corpus.natural8(32, 32, 1, seed=73).astype(dtype) - 100).astype(dtype)
    roundtrip(img, Mode.FTL)


def test_index_groups():
    rng = np.random.default_rng(74)
    vals = np.array([0, 1 << 12, 3 << 12, 7 << 12], dtype=np.uint16)
    roundtrip(vals[rng.integers(0, 4, size=(32, 32, 1))], Mode.CF_H)


def test_cf_heavy():
    roundtrip(corpus.to_type(corpus.natural8(32, 32, 1, seed=75), np.uint16, 5), Mode.CF_H)


def test_partial_edges():
    roundtrip(corpus.natural8(30, 33, 1, seed=76), Mode.FTL)
    roundtrip(corpus.natural8(13, 62, 3, seed=77), Mode.CF_H)


@pytest.mark.parametrize("mode", [Mode.RLE_H, Mode.CF_RLE_H, Mode.RLE])
def test_rle_modes(mode):
    img = np.zeros((64, 64, 1), np.uint8)
    img[10:20] = 200
    roundtrip(img, mode)


@pytest.mark.parametrize("quanta,away", [(2, False), (2, True), (3, False), (4, False), (4, True), (10, False)])
def test_quanta_u8(quanta, away):
    roundtrip(corpus.natural8(32, 32, 1, seed=78), Mode.FTL, quanta=quanta, away=away)


def test_quanta_signed():
    img = (corpus.natural8(32, 32, 1, seed=79).astype(np.int16) - 128).astype(np.int16)
    roundtrip(img, Mode.CF_H, quanta=5)
    roundtrip(img, Mode.FTL, quanta=3, away=True)


def test_quanta_lossy_bound():
    img = corpus.natural8(32, 32, 1, seed=80)
    q = 4
    s = qb3_tpu.encode(img, mode=Mode.FTL, quanta=q)
    dec, _ = qb3_tpu.decode(s)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= q // 2 + q % 2


def test_stored_roundtrip():
    img = corpus.random_noise(16, 16, 1, np.uint8, seed=81)
    roundtrip(img, Mode.FTL)


def test_small_images():
    for h, w, c in [(5, 3, 2), (3, 9, 1), (2, 20, 1), (1, 64, 3), (40, 2, 1), (4, 4, 1)]:
        img = corpus.natural8(h, w, c, seed=h * 10 + w)
        ours = qb3_tpu.encode(img, mode=Mode.FTL)
        dec, _ = qb3_tpu.decode(ours)
        np.testing.assert_array_equal(dec, img, err_msg=f"{h}x{w}x{c}")


def test_multiband_8():
    img = corpus.natural8(32, 32, 8, seed=82).astype(np.uint16) * 257
    cb = [1, 1, 1, 4, 4, 4, 6, 7]
    roundtrip(img.astype(np.uint16), Mode.FTL, coreband=cb)
    roundtrip(img.astype(np.uint16), Mode.CF_H, coreband=cb)


@pytest.mark.parametrize("dtype,mult", [
    (np.uint32, 65537), (np.uint64, 1 << 40), (np.uint64, 1 << 56),
])
def test_ix_sidecar_wide(dtype, mult):
    """The fused register-window wavefront on 32/64-bit ix streams."""
    img = corpus.to_type(corpus.natural8(48, 32, 1, seed=85), dtype, mult)
    s = qb3_tpu.encode(img, mode=Mode.FTL, index=True)
    dec = qb3_tpu.Decoder(s)
    np.testing.assert_array_equal(dec.read_data(), img)
    assert dec.decode_path == "ix"


def test_ix_sidecar_u64_rung63():
    img = corpus.natural8(32, 32, 1, seed=86).astype(np.uint64)
    img[0, 0, 0] = (1 << 63) | (1 << 62)
    img[8, 0, 0] = (1 << 64) - 1
    s = qb3_tpu.encode(img, mode=Mode.FTL, index=True)
    from qb3_tpu import container
    assert container.parse_headers(s).mode == Mode.FTL
    dec = qb3_tpu.Decoder(s)
    np.testing.assert_array_equal(dec.read_data(), img)
    assert dec.decode_path == "ix"

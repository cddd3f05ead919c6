"""API-surface conformance: the less-traveled C API behaviors."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu import container
from qb3_tpu.api import Encoder, max_encoded_size, normalize_cband
from qb3_tpu.constants import DType, Mode

from . import corpus, refqb3

pytestmark = pytest.mark.skipif(not refqb3.available(), reason="oracle not built")


def test_max_encoded_size_matches_reference():
    import ctypes as ct

    for (w, h, b, dt) in [(512, 512, 3, 0), (33, 7, 2, 2), (100, 100, 1, 6)]:
        p = refqb3.LIB.qb3_create_encoder(w, h, b, dt)
        assert max_encoded_size(w, h, b, dt) == refqb3.LIB.qb3_max_encoded_size(p)
        refqb3.LIB.qb3_destroy_encoder(p)


def test_coreband_normalization_matches_reference():
    import ctypes as ct

    cases = [
        (4, [3, 3, 3, 3]),
        (4, [1, 2, 3, 0]),   # cycle: forced consistent
        (3, [2, 2, 9]),      # out of range -> identity for that band
        (5, [1, 1, 1, 1, 1]),
    ]
    for nb, cband in cases:
        p = refqb3.LIB.qb3_create_encoder(64, 64, nb, 0)
        arr = (ct.c_size_t * nb)(*cband)
        assert refqb3.LIB.qb3_set_encoder_coreband(p, nb, arr)
        ref = list(arr)
        refqb3.LIB.qb3_destroy_encoder(p)
        assert normalize_cband(nb, list(cband)) == ref, (nb, cband)


def test_encoder_stride_input():
    img = corpus.natural8(32, 32, 1, seed=600)
    stride = 40  # type units per row
    buf = np.zeros((32 * stride,), np.uint8)
    for y in range(32):
        buf[y * stride : y * stride + 32] = img[y, :, 0]
    enc = Encoder(32, 32, 1, DType.U8)
    enc.set_mode(Mode.FTL)
    enc.set_stride(stride)
    ours = enc.encode(buf)
    assert ours == refqb3.ref_encode(img, mode=8)


def test_decoder_stride_output():
    img = corpus.natural8(16, 16, 1, seed=601)
    s = qb3_tpu.encode(img, mode=Mode.FTL)
    dec = qb3_tpu.Decoder(s)
    dec.set_stride(24)
    out = dec.read_data()
    assert out.shape == (16 * 24,)
    got = np.stack([out[y * 24 : y * 24 + 16] for y in range(16)])
    np.testing.assert_array_equal(got, img[:, :, 0])


def test_decoder_info_getters():
    img = corpus.natural8(16, 16, 3, seed=602)
    s = qb3_tpu.encode(img, mode=Mode.CF_H, quanta=3)
    d = qb3_tpu.Decoder(s)
    assert d.image_size == (16, 16, 3)
    assert d.decoded_size() == img.nbytes
    assert d.info.mode == Mode.CF_H
    assert d.info.quanta == 3
    assert d.info.cband == [1, 1, 1]
    ref_img, ref_info = refqb3.ref_decode(s)
    assert ref_info["mode"] == d.info.mode
    assert ref_info["quanta"] == d.info.quanta
    assert ref_info["coreband"] == d.info.cband
    assert ref_info["order"] == (d.info.order or 0x01548CD9AEFB7623)


def test_invalid_encoder_params():
    with pytest.raises(ValueError):
        Encoder(0, 10, 1, DType.U8)
    with pytest.raises(ValueError):
        Encoder(10, 10, 257, DType.U8)  # engine extension caps at 256 bands
    with pytest.raises(ValueError):
        Encoder(70000, 10, 1, DType.U8)
    e = Encoder(10, 10, 1, DType.U8)
    assert e.set_quanta(1)
    assert e.set_quanta(255)
    assert not e.set_quanta(256)  # exceeds uint8 max
    assert not e.set_quanta(0)


def test_mode_setter_rejects_invalid():
    e = Encoder(16, 16, 1, DType.U8)
    assert e.set_mode(8) == Mode.FTL
    assert e.set_mode(99) == Mode.FTL  # unchanged, like the reference


def test_sticky_error_state():
    """qb3_get_encoder_state parity: a failed encode leaves the handle in a
    sticky error state until reset (QB3encode.cpp:338)."""
    from qb3_tpu.constants import Error
    from qb3_tpu.errors import QB3Error, QB3ShapeError

    enc = Encoder(32, 32, 1, DType.U8)
    with pytest.raises(QB3ShapeError):
        enc.encode(np.zeros((32, 32, 1), np.uint16))  # wrong dtype
    assert enc.error == Error.EINV
    with pytest.raises(QB3Error):
        enc.encode(np.zeros((32, 32, 1), np.uint8))  # sticky: still fails
    enc.reset()
    assert enc.error == Error.OK
    assert enc.encode(np.zeros((32, 32, 1), np.uint8))

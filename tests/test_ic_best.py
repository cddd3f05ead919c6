"""Self-contained best-mode decode: the "ic" chunk anchors extended to
CF/index streams (spans + entry rungs + entry pcf per band), replacing the
~40% "ib" per-group sidecar.  Byte-exact vs the plain stream; the chunk
walk must agree with the serial walk (offsets.py) on every group kind."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu import container
from qb3_tpu.api import Decoder
from qb3_tpu.constants import Mode

from . import corpus, refqb3


@pytest.mark.parametrize("dt,mult,h,w,nb", [
    (np.uint8, 1, 64, 64, 3),
    (np.uint8, 5, 64, 64, 1),        # CF-heavy (every group has factor 5)
    (np.uint16, 301, 64, 64, 2),
    (np.uint32, 2001, 32, 64, 1),
    (np.uint64, 40009, 32, 32, 1),
])
def test_ic_best_roundtrip(dt, mult, h, w, nb):
    img = (corpus.natural8(h, w, nb, seed=7).astype(dt) * dt(mult))
    s_ic = qb3_tpu.encode(img, mode=Mode.CF_H, index="ic")
    info = container.parse_headers(s_ic)
    assert info.index_chunked is not None
    d = Decoder(s_ic)
    out = d.read_data()
    assert d.decode_path == "ic-best"
    np.testing.assert_array_equal(out.reshape(img.shape), img)
    # payload identical to the sidecar-free stream
    plain = qb3_tpu.encode(img, mode=Mode.CF_H)
    assert s_ic[info.data_offset:] == \
        plain[container.parse_headers(plain).data_offset:]


def test_ic_best_rle_mode():
    img = np.zeros((64, 64, 1), np.uint8)
    img[8:16, 8:16, 0] = 7
    s = qb3_tpu.encode(img, mode=Mode.CF_RLE_H, index="ic")
    dec, _ = qb3_tpu.decode(s)
    np.testing.assert_array_equal(dec.reshape(img.shape), img)


@pytest.mark.skipif(not refqb3.available(), reason="oracle missing")
def test_ic_best_reference_compat():
    """The reference decoder skips the lowercase 'ic' chunk and decodes."""
    img = corpus.natural8(64, 64, 3, seed=11)
    s = qb3_tpu.encode(img, mode=Mode.CF_H, index="ic")
    rimg, _ = refqb3.ref_decode(s)
    np.testing.assert_array_equal(rimg.reshape(img.shape), img)


def test_ic_best_strip_state():
    """Second image on the same encoder carries band state into the anchors."""
    enc = qb3_tpu.Encoder(64, 64, 1, qb3_tpu.DType.U8)
    enc.set_mode(Mode.CF_H)
    enc.with_index = "ic"
    a = corpus.natural8(64, 64, 1, seed=1)
    b = corpus.natural8(64, 64, 1, seed=2)
    sa = enc.encode(a)
    sb = enc.encode(b)
    enc2 = qb3_tpu.Encoder(64, 64, 1, qb3_tpu.DType.U8)
    enc2.set_mode(Mode.CF_H)
    plain_a = enc2.encode(a)
    plain_b = enc2.encode(b)
    ia, ib_ = container.parse_headers(sa), container.parse_headers(sb)
    pa, pb = container.parse_headers(plain_a), container.parse_headers(plain_b)
    assert sa[ia.data_offset:] == plain_a[pa.data_offset:]
    assert sb[ib_.data_offset:] == plain_b[pb.data_offset:]
    da = Decoder(sa)
    np.testing.assert_array_equal(da.read_data().reshape(a.shape), a)
    assert da.decode_path == "ic-best"


def test_ic_best_wide_cf_fallback():
    """CFs beyond 16 bits cannot ride the u16 pcf anchors: the encoder
    falls back (ib or sidecar-free), and decode still works."""
    img = (corpus.natural8(32, 32, 1, seed=7).astype(np.uint64)
           * np.uint64(1 << 40))
    s = qb3_tpu.encode(img, mode=Mode.CF_H, index="ic")
    info = container.parse_headers(s)
    assert info.index_chunked is None
    dec, _ = qb3_tpu.decode(s)
    np.testing.assert_array_equal(dec.reshape(img.shape), img)

""">16-band extension (VERDICT r2 missing item 6): the engine accepts up to
256 bands (the container's full range, container.py:77); the reference
encoder caps at 16 (QB3.h:34) so there is no oracle for these streams —
roundtrip + container invariants are the contract."""

import numpy as np

import qb3_tpu
from qb3_tpu import container
from qb3_tpu.api import DT_FROM_NP, Encoder
from qb3_tpu.constants import Mode

from . import corpus


def _img(h, w, nb, npdt, mult, seed):
    rng = np.random.default_rng(seed)
    base = corpus.natural8(h, w, min(nb, 3), seed=seed)
    out = np.zeros((h, w, nb), np.uint8)
    for c in range(nb):
        out[:, :, c] = np.clip(
            base[:, :, c % base.shape[2]].astype(np.int32)
            + rng.integers(-9, 9, (h, w)), 0, 255)
    return out.astype(npdt) * npdt(mult) if mult != 1 else out


def test_64band_u16_ftl_roundtrip():
    img = _img(32, 32, 64, np.uint16, 257, seed=5)
    e = Encoder(32, 32, 64, DT_FROM_NP[img.dtype])
    e.set_mode(Mode.FTL)
    s = e.encode(img)
    info = container.parse_headers(s)
    assert info.nbands == 64
    dec, _ = qb3_tpu.decode(s)
    assert (dec == img).all()


def test_256band_u8_base_roundtrip():
    img = _img(16, 16, 256, np.uint8, 1, seed=6)
    e = Encoder(16, 16, 256, DT_FROM_NP[img.dtype])
    e.set_mode(Mode.BASE_H)
    s = e.encode(img)
    dec, _ = qb3_tpu.decode(s)
    assert (dec == img).all()


def test_32band_best_with_ib_sidecar():
    img = (_img(32, 32, 32, np.uint16, 1, seed=7) * np.uint16(7))
    e = Encoder(32, 32, 32, DT_FROM_NP[img.dtype])
    e.set_mode(Mode.CF_H)
    e.with_index = True
    s = e.encode(img)
    info = container.parse_headers(s)
    assert info.index_best is not None
    dec, _ = qb3_tpu.decode(s)
    assert (dec == img).all()

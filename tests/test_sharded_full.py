"""Hardened multichip paths: container framing, quanta/RLE/best under
sharding, the 2-D (batch x rows) mesh, and the device-side stitch — all
byte-exact with the single-device Encoder on the virtual 8-device mesh."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu import container
from qb3_tpu.constants import Mode
from qb3_tpu.errors import QB3ShapeError
from qb3_tpu.parallel.sharded import encode_sharded, encode_tiles_sharded

from . import corpus, refqb3


def single(img, mode, **kw):
    return qb3_tpu.encode(img, mode=mode, **kw)


@pytest.mark.parametrize("mode", [Mode.FTL, Mode.BASE_H, Mode.BASE_Z])
def test_framed_fast_modes(mode):
    img = corpus.natural8(64, 48, 3, seed=130)
    s = encode_sharded(img, 4, mode=mode)
    assert s == single(img, mode)
    dec, _ = qb3_tpu.decode(s)
    np.testing.assert_array_equal(dec, img)


def test_framed_best_mode():
    img = corpus.natural8(64, 40, 2, seed=131)
    img[:, :, 1] = (img[:, :, 1] // 3) * 9  # plant CFs so pcf chains matter
    s = encode_sharded(img, 4, mode=Mode.CF_H)
    assert s == single(img, Mode.CF_H)


def test_framed_best_pcf_across_shards():
    """A CF set in shard k must feed shard k+1's same/diff decision."""
    img = (corpus.natural8(96, 32, 1, seed=132).astype(np.uint16) * 257)
    s = encode_sharded(img.astype(np.uint16), 8, mode=Mode.CF_H)
    assert s == single(img.astype(np.uint16), Mode.CF_H)


def test_framed_quanta_rle():
    img = np.zeros((64, 64, 1), np.uint8)
    img[8:24, 8:40] = 144
    s = encode_sharded(img, 4, mode=Mode.RLE_H, quanta=4)
    assert s == single(img, Mode.RLE_H, quanta=4)
    dec, info = qb3_tpu.decode(s)
    assert info.mode == Mode.RLE_H and info.quanta == 4


def test_framed_sidecars_decode():
    img = corpus.natural8(64, 64, 3, seed=133)
    for idx in (True, "ic"):
        s = encode_sharded(img, 4, mode=Mode.FTL, index=idx)
        info = container.parse_headers(s)
        assert (info.index if idx is True else info.index_chunked) is not None
        dec = qb3_tpu.Decoder(s)
        np.testing.assert_array_equal(dec.read_data(), img)
        assert dec.decode_path == ("ix" if idx is True else "ic")
    if refqb3.available():
        rd, _ = refqb3.ref_decode(s)
        np.testing.assert_array_equal(rd.reshape(img.shape), img)


def test_framed_coreband():
    img = corpus.natural8(64, 32, 3, seed=134)
    s = encode_sharded(img, 8, mode=Mode.FTL, coreband=[1, 1, 1])
    assert s == single(img, Mode.FTL)  # [1,1,1] is the RGB default


def test_stored_fallback():
    img = corpus.random_noise(16, 16, 1, np.uint8, seed=135)
    s = encode_sharded(img, 4, mode=Mode.FTL)
    assert container.parse_headers(s).mode == Mode.STORED
    dec, _ = qb3_tpu.decode(s)
    np.testing.assert_array_equal(dec, img)


def test_2d_mesh_batch_rows():
    tiles = np.stack([corpus.natural8(32, 32, 3, seed=140 + i) for i in range(4)])
    payloads = encode_tiles_sharded(tiles, n_batch=2, n_rows=4)
    for i in range(4):
        ref = single(tiles[i], Mode.FTL, coreband=[0, 1, 2])
        info = container.parse_headers(ref)
        assert payloads[i] == ref[info.data_offset:], f"tile {i}"


def test_shape_errors():
    img = corpus.natural8(60, 32, 1, seed=141)  # 60 not divisible by 4*8
    with pytest.raises(QB3ShapeError):
        encode_sharded(img, 8)

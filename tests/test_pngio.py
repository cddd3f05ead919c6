"""PNG I/O incl. 16-bit (cqb3.cpp:334-339 parity) and the CLI around it."""

import numpy as np
import pytest

from qb3_tpu import pngio

from . import corpus


def test_unfilter_matches_pillow(tmp_path):
    """Pillow writes adaptively-filtered scanlines (sub/up/avg/paeth); the
    pure reader must undo them identically."""
    from PIL import Image

    img = corpus.natural8(64, 48, 3, seed=120)
    p = tmp_path / "f.png"
    Image.fromarray(img).save(p)
    ours = pngio._read_pure(p.read_bytes())
    theirs = np.asarray(Image.open(p))
    np.testing.assert_array_equal(ours, theirs)


def test_16bit_gray_roundtrip(tmp_path):
    img = corpus.to_type(corpus.natural8(40, 32, 1, seed=121), np.uint16, 257)
    p = str(tmp_path / "g16.png")
    pngio.write_png(p, img)
    back = pngio.read_png(p)
    np.testing.assert_array_equal(back.reshape(img.shape), img)
    assert back.dtype == np.uint16


def test_16bit_rgb_roundtrip(tmp_path):
    img = corpus.to_type(corpus.natural8(32, 32, 3, seed=122), np.uint16, 250)
    p = str(tmp_path / "rgb48.png")
    pngio.write_png(p, img)
    w, h, depth, nch = pngio.probe(open(p, "rb").read())
    assert (w, h, depth, nch) == (32, 32, 16, 3)
    back = pngio.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_pillow_reads_our_16bit_gray(tmp_path):
    from PIL import Image

    img = corpus.to_type(corpus.natural8(24, 24, 1, seed=123), np.uint16, 200)
    p = str(tmp_path / "g.png")
    pngio.write_png(p, img)
    theirs = np.asarray(Image.open(p))
    np.testing.assert_array_equal(theirs, img[:, :, 0].astype(np.int32))


def test_cli_16bit_end_to_end(tmp_path):
    from qb3_tpu import cli

    img = corpus.to_type(corpus.natural8(48, 48, 1, seed=124), np.uint16, 257)
    src = str(tmp_path / "in.png")
    pngio.write_png(src, img)
    q = str(tmp_path / "out.qb3")
    assert cli.main([src, q]) == 0
    out = str(tmp_path / "back.png")
    assert cli.main(["-d", q, out]) == 0
    np.testing.assert_array_equal(pngio.read_png(out).reshape(img.shape), img)


def test_cli_npy_wide_types(tmp_path):
    from qb3_tpu import cli

    img = corpus.to_type(corpus.natural8(32, 32, 1, seed=125), np.uint32, 65537)
    src = str(tmp_path / "in.npy")
    np.save(src, img)
    q = str(tmp_path / "out.qb3")
    assert cli.main([src, q]) == 0
    out = str(tmp_path / "back.png")  # falls back to .npy for u32
    assert cli.main(["-d", q, out]) == 0
    back = np.load(str(tmp_path / "back.npy"))
    np.testing.assert_array_equal(back, img)

"""CLI converter end-to-end (PNG <-> QB3 via Pillow)."""

import os

import numpy as np
import pytest

from qb3_tpu.cli import main

from . import corpus

PIL = pytest.importorskip("PIL.Image")


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr[:, :, 0] if arr.shape[2] == 1 else arr).save(path)


def test_png_roundtrip(tmp_path):
    img = corpus.natural8(32, 40, 3, seed=230)
    src = str(tmp_path / "in.png")
    _write_png(src, img)
    assert main([src, str(tmp_path / "x.qb3"), "-v"]) == 0
    assert main(["-d", str(tmp_path / "x.qb3"), str(tmp_path / "out.png"), "-v"]) == 0
    from PIL import Image

    out = np.asarray(Image.open(tmp_path / "out.png"))
    np.testing.assert_array_equal(out, img)


def test_best_and_quanta(tmp_path):
    img = corpus.natural8(32, 32, 1, seed=231)
    src = str(tmp_path / "g.png")
    _write_png(src, img)
    assert main([src, str(tmp_path / "b.qb3"), "-b"]) == 0
    assert main([src, str(tmp_path / "q.qb3"), "-q", "+4"]) == 0
    assert os.path.getsize(tmp_path / "q.qb3") < os.path.getsize(tmp_path / "b.qb3")
    assert main(["-d", str(tmp_path / "q.qb3"), str(tmp_path / "q.png")]) == 0
    from PIL import Image

    out = np.asarray(Image.open(tmp_path / "q.png"))
    assert np.abs(out.astype(int) - img[:, :, 0].astype(int)).max() <= 2


def test_bandmix(tmp_path):
    img = corpus.natural8(32, 32, 3, seed=232)
    src = str(tmp_path / "rgb.png")
    _write_png(src, img)
    assert main([src, str(tmp_path / "m.qb3"), "-m", "-v"]) == 0
    assert main(["-d", str(tmp_path / "m.qb3"), str(tmp_path / "m.png")]) == 0
    from PIL import Image

    np.testing.assert_array_equal(np.asarray(Image.open(tmp_path / "m.png")), img)


def test_folder_batch(tmp_path):
    for i in range(2):
        _write_png(str(tmp_path / f"t{i}.png"), corpus.natural8(16, 16, 1, seed=233 + i))
    assert main([str(tmp_path), "-v"]) == 0
    assert (tmp_path / "t0.qb3").exists() and (tmp_path / "t1.qb3").exists()

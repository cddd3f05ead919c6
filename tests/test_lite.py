"""NumPy-only lite decoder: must match the reference for every stream kind."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu import lite
from qb3_tpu.constants import Mode

from . import corpus, refqb3

pytestmark = pytest.mark.skipif(not refqb3.available(), reason="oracle not built")


@pytest.mark.parametrize("mode", [Mode.FTL, Mode.BASE_H, Mode.CF_H, Mode.RLE_H])
def test_lite_decodes_reference_streams(mode):
    img = corpus.natural8(48, 40, 3, seed=240)
    s = refqb3.ref_encode(img, mode=int(mode))
    out, info = lite.decode(s)
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("dtype,mult", [(np.uint16, 5), (np.uint64, 1 << 56)])
def test_lite_wide(dtype, mult):
    img = corpus.to_type(corpus.natural8(32, 32, 1, seed=241), dtype, mult)
    for mode in (Mode.FTL, Mode.CF_H):
        s = qb3_tpu.encode(img, mode=mode)
        out, _ = lite.decode(s)
        np.testing.assert_array_equal(out, img)


def test_lite_quanta_and_small():
    img = corpus.natural8(32, 32, 1, seed=242)
    s = refqb3.ref_encode(img, mode=8, quanta=4)
    ref, _ = refqb3.ref_decode(s)
    out, _ = lite.decode(s)
    np.testing.assert_array_equal(out, ref)
    tiny = corpus.natural8(3, 9, 1, seed=243)
    s2 = qb3_tpu.encode(tiny, mode=Mode.FTL)
    out2, _ = lite.decode(s2)
    np.testing.assert_array_equal(out2, tiny)

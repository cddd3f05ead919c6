"""Seeded fuzz sweep: random shapes x dtypes x modes, byte-compared."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu.constants import Mode

from . import corpus, refqb3

pytestmark = pytest.mark.skipif(not refqb3.available(), reason="oracle not built")

CASES = []
_rng = np.random.default_rng(4242)
for _i in range(14):
    h = int(_rng.integers(4, 70))
    w = int(_rng.integers(4, 70))
    c = int(_rng.choice([1, 2, 3, 4, 5]))
    dt = np.dtype(str(_rng.choice(["uint8", "int16", "uint16", "uint32", "int64"])))
    mode = Mode(int(_rng.choice([0, 1, 4, 5, 8])))
    quanta = int(_rng.choice([1, 1, 1, 3, 7]))
    CASES.append((h, w, c, dt, mode, quanta, 500 + _i))


@pytest.mark.parametrize("h,w,c,dt,mode,quanta,seed", CASES)
def test_fuzz_case(h, w, c, dt, mode, quanta, seed):
    rng = np.random.default_rng(seed)
    base = corpus.natural8(h, w, c, seed=seed).astype(dt)
    # mix in structure: scale + occasional spikes + flat regions
    mult = int(rng.choice([1, 3, 257 % (np.iinfo(dt).max // 2 + 1) + 1]))
    img = (base * np.array(mult, dt)).astype(dt)
    img[: h // 3] = img[0, 0]
    ours = qb3_tpu.encode(img, mode=mode, quanta=quanta)
    ref = refqb3.ref_encode(img, mode=int(mode), quanta=quanta)
    assert ours == ref, f"stream mismatch {h}x{w}x{c} {dt} mode={mode} q={quanta}"
    dec, _ = qb3_tpu.decode(ours)
    if c in (1, 3, 4):
        # identity-coreband multiband streams hit reference bug #3
        # (REFERENCE_BUGS.md): its decoder zeroes the missing CB default
        ref_dec, _ = refqb3.ref_decode(ref)
        np.testing.assert_array_equal(dec, ref_dec)
    if quanta == 1:
        np.testing.assert_array_equal(dec, img)
    else:
        from qb3_tpu.api import dequantize, quantize
        np.testing.assert_array_equal(dec, dequantize(quantize(img, quanta, False), quanta))

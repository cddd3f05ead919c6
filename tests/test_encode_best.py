"""Byte-exact conformance of the best encoder (CF + index trials)."""

import numpy as np
import pytest

import qb3_tpu
from qb3_tpu.constants import Mode

from . import corpus, refqb3

pytestmark = pytest.mark.skipif(not refqb3.available(), reason="oracle not built")


def check_exact(img, mode, **kw):
    ours = qb3_tpu.encode(img, mode=mode, **kw)
    ref = refqb3.ref_encode(img, mode=int(mode), **kw)
    assert ours == ref, (
        f"stream mismatch: len {len(ours)} vs {len(ref)}; first diff at "
        f"{next((i for i in range(min(len(ours), len(ref))) if ours[i] != ref[i]), -1)}"
    )


@pytest.mark.parametrize("mode", [Mode.CF_H, Mode.CF])
def test_natural_u8(mode):
    check_exact(corpus.natural8(48, 48, 1, seed=20), mode)


def test_rgb_u8():
    check_exact(corpus.natural8(64, 40, 3, seed=21), Mode.CF_H)


def test_cf_heavy():
    # multiply by 5: every delta shares a factor -> CF encodings everywhere
    # (the reference test strategy, test_qb3.cpp:675-685)
    img = corpus.to_type(corpus.natural8(32, 32, 1, seed=22), np.uint8, 5)
    check_exact(img, Mode.CF_H)


@pytest.mark.parametrize("dtype,mult", [
    (np.uint16, 5), (np.uint16, 257), (np.uint32, 65537 * 3), (np.uint64, 5 << 40),
])
def test_cf_wide_types(dtype, mult):
    img = corpus.to_type(corpus.natural8(32, 32, 1, seed=23), dtype, mult)
    check_exact(img, Mode.CF_H)


def test_index_encoding_trigger():
    # few distinct large values per group -> index encoding wins
    rng = np.random.default_rng(24)
    vals = np.array([0, 1 << 12, 3 << 12, 7 << 12], dtype=np.uint16)
    img = vals[rng.integers(0, 4, size=(32, 32, 1))]
    check_exact(img, Mode.CF_H)


def test_pcf_chain():
    # alternating common factors exercise the same/different CF flag chain
    img8 = corpus.natural8(32, 32, 1, seed=25)
    img = img8.astype(np.uint16)
    img[::8] *= 5
    img[1::8] *= 3
    check_exact(img.astype(np.uint16), Mode.CF_H)


def test_u64_noise_best():
    img = corpus.random_noise(16, 16, 1, np.uint64, seed=26)
    img[::2] >>= np.uint64(40)
    check_exact(img, Mode.CF_H)


def test_u64_ienc_800_divergence():
    """Documented divergence from the reference (its bug).

    For u64 groups at rung >= ~50 with >8 distinct values, the reference's
    ienc returns the sentinel 800 without writing anything; when the group's
    actual size exceeds 800 bits the trial "wins" and the group is replaced
    by an *empty* encoding (QB3encode.h:562-564, :700-711), corrupting the
    stream — the reference cannot decode its own output.  Our engine treats
    the >8-unique case as an invalid candidate, so the group encodes normally
    (and the whole image falls back to STORED here).  The reference must be
    able to decode our stream.
    """
    rng = np.random.default_rng(52)
    img = rng.integers(0, 1 << 60, size=(8, 8, 1), dtype=np.uint64)
    ours = qb3_tpu.encode(img, mode=Mode.CF_H)
    dec, _ = refqb3.ref_decode(ours)
    np.testing.assert_array_equal(dec, img)
    # and the reference's own stream is indeed broken
    ref = refqb3.ref_encode(img, mode=int(Mode.CF_H))
    with pytest.raises(AssertionError):
        refqb3.ref_decode(ref)


def test_cross_decode_best():
    img = corpus.to_type(corpus.natural8(40, 44, 3, seed=27), np.uint16, 5)
    ours = qb3_tpu.encode(img, mode=Mode.CF_H)
    dec, info = refqb3.ref_decode(ours)
    np.testing.assert_array_equal(dec, img)


def test_group_gcd_adversarial():
    """Binary-GCD regression: pairs with a large odd/odd ratio (e.g. 3 vs
    257*k) need the halving step; a subtract-only loop would not converge."""
    import math

    import jax.numpy as jnp

    from qb3_tpu.ops.bitutils import magsabs
    from qb3_tpu.ops.encode_best import group_gcd

    rng = np.random.default_rng(99)
    m = rng.integers(0, 1 << 16, size=(128, 1, 16), dtype=np.uint16)
    m[0, 0] = (np.arange(16, dtype=np.uint16) * 257) * 2  # magsabs = 257*i
    m[1, 0, :8] = 6
    m[1, 0, 8:] = 1028  # gcd(3, 514) = 1 after magsabs
    m[2, 0] = 0
    got = np.asarray(group_gcd(jnp.asarray(m), jnp.uint32)).astype(np.int64)
    a = np.asarray(magsabs(jnp.asarray(m))).astype(np.int64)
    for i in range(m.shape[0]):
        want = 0
        for v in a[i, 0]:
            want = math.gcd(want, int(v))
        assert got[i, 0] == want, (i, got[i, 0], want, a[i, 0])

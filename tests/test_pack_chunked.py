"""Fused Pallas pack kernel (pack_groups_chunked) vs the XLA reference
pack_groups, in interpret mode (the real-chip path is exercised by bench.py
and tools/profile_wide_stages.py on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qb3_tpu.api import max_encoded_size
from qb3_tpu.constants import HILBERT
from qb3_tpu.ops import bitpack
from qb3_tpu.ops.encode import encode_fast_blocks
from qb3_tpu.ops.pack_pallas import pack_groups_chunked

from . import corpus


@pytest.mark.parametrize("npdt,mult,dtc", [
    (np.uint8, 1, 0), (np.uint16, 257, 2),
    (np.uint32, 1 << 16, 4), (np.uint64, 1 << 40, 6),
])
def test_chunked_matches_reference_pack(npdt, mult, dtc):
    img8 = corpus.natural8(16, 16, 1, seed=17)
    img = img8.astype(npdt) * npdt(mult) if mult != 1 else img8
    h, w, nb = img.shape
    tbits = np.dtype(npdt).itemsize * 8
    codes, lens, _, _ = encode_fast_blocks(
        jnp.asarray(img), jnp.zeros(nb, npdt), jnp.zeros(nb, jnp.int32),
        HILBERT, (0,), True)
    n_words = (max_encoded_size(w, h, nb, dtc) + 3) // 4 + 2
    maxbits = bitpack.group_bits_bound(tbits, best=False)
    wr, tr, gr = bitpack.pack_groups(codes, lens, n_words, maxbits)
    wn, tn, gn = pack_groups_chunked(codes, lens, n_words, maxbits,
                                     interpret=True)
    nw = (int(tr) + 31) // 32
    assert int(tr) == int(tn)
    assert (np.asarray(gr) == np.asarray(gn)).all()
    assert (np.asarray(wr)[:nw] == np.asarray(wn)[:nw]).all()


def test_extract_windows_interpret():
    from qb3_tpu.ops.pack_pallas import extract_windows

    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 32, 2048, dtype=np.int64).astype(np.uint32)
    wrow = jnp.asarray(np.array([0, 2, 7], np.int32))
    out = np.asarray(extract_windows(jnp.asarray(words), wrow, 512,
                                     interpret=True))
    for t, r in enumerate([0, 2, 7]):
        assert (out[t] == words[r * 128 : r * 128 + 512]).all()

"""Locate the u64 batch-encode regression: vmapped phase A vs vmapped pack.

BENCH ftl-u64-batch8 encodes at 994 MB/s while single-dispatch runs 1805
(8.45 vs 4.65 ms/tile) — something in the vmap composition costs ~2x.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from qb3_tpu.batch import _batch_encode_kernel
    from qb3_tpu.benchutil import sustained
    from qb3_tpu.constants import HILBERT
    from qb3_tpu.ops import bitpack
    from qb3_tpu.ops.encode import encode_fast_blocks
    from qb3_tpu.ops.pack_pallas import pack_groups_chunked

    from bench import natural_image

    NB, h, w, nb = 8, 1024, 1024, 1
    tiles = np.stack([
        natural_image(h, w, nb, seed=300 + i).astype(np.uint64)
        * np.uint64(1 << 40) for i in range(NB)])
    raw_mb = tiles.nbytes / 1e6
    n_words = tiles[0].nbytes // 4 + 4096
    maxbits = bitpack.group_bits_bound(64, best=False)
    IT = int(os.environ.get("QB3_PROF_ITERS", "30"))
    dtiles = jax.device_put(jnp.asarray(tiles))
    print(f"u64 batch{NB} raw {raw_mb:.1f} MB, iters={IT}")

    ekb = _batch_encode_kernel(NB, (h, w, nb), "uint64", HILBERT,
                               tuple(range(nb)), True, n_words)
    jax.block_until_ready(ekb(dtiles))
    t = sustained(lambda: ekb(dtiles), IT)
    print(f"batch encode full:  {1e3*t:8.3f} ms  {raw_mb/t:7.0f} MB/s"
          f"  ({1e3*t/NB:.3f} ms/tile)")

    zp = jnp.zeros(nb, dtype=jnp.uint64)
    zr = jnp.zeros(nb, jnp.int32)

    def one_a(img):
        return encode_fast_blocks(img, zp, zr, HILBERT, tuple(range(nb)),
                                  True, with_rungs=True)[:2]

    fa = jax.jit(jax.vmap(one_a))
    ra = jax.block_until_ready(fa(dtiles))
    t_a = sustained(lambda: fa(dtiles), IT)
    print(f"  vmap phase A:     {1e3*t_a:8.3f} ms  {raw_mb/t_a:7.0f} MB/s"
          f"  ({1e3*t_a/NB:.3f} ms/tile)")

    codes, lens = ra

    def one_p(c, l):
        return pack_groups_chunked(c, l, n_words, maxbits)

    fp = jax.jit(jax.vmap(one_p))
    jax.block_until_ready(fp(codes, lens))
    t_p = sustained(lambda: fp(codes, lens), IT)
    print(f"  vmap pack:        {1e3*t_p:8.3f} ms  {raw_mb/t_p:7.0f} MB/s"
          f"  ({1e3*t_p/NB:.3f} ms/tile)")

    # flat alternative: one big pack over the concatenated group axis
    S = codes.shape[2]
    cflat = codes.reshape(-1, S)
    lflat = lens.reshape(-1, S)
    fpf = jax.jit(lambda c, l: pack_groups_chunked(c, l, n_words * NB,
                                                   maxbits))
    try:
        jax.block_until_ready(fpf(cflat, lflat))
        t_pf = sustained(lambda: fpf(cflat, lflat), IT)
        print(f"  flat pack:        {1e3*t_pf:8.3f} ms  {raw_mb/t_pf:7.0f}"
              f" MB/s  ({1e3*t_pf/NB:.3f} ms/tile)")
    except Exception as e:
        print("  flat pack failed:", type(e).__name__, str(e)[:200])


if __name__ == "__main__":
    main()

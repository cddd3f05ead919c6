"""Split the u64 pack cost: XLA prep vs Pallas kernel vs W48 bucket.

pack_groups_chunked statically sizes W from the worst-case group
(max_group_bits=1081 -> W48=40, R8T~672) while natural u64 data with
~47-bit magnitudes peaks near 800 bits.  Measures the current kernel, a
prep-only jit, and compact-W variants gated on the stream's actual max
group length.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from qb3_tpu.benchutil import sustained
    from qb3_tpu.constants import HILBERT
    from qb3_tpu.ops import bitpack
    from qb3_tpu.ops.encode import encode_fast_blocks
    from qb3_tpu.ops.pack_pallas import pack_groups_chunked

    from bench import natural_image

    h, w, nb = 1024, 1024, 1
    img = natural_image(h, w, nb, seed=9).astype(np.uint64) * np.uint64(1 << 40)
    raw_mb = img.nbytes / 1e6
    from qb3_tpu.api import max_encoded_size
    n_words = (max_encoded_size(w, h, nb, 6) + 3) // 4 + 2
    maxbits = bitpack.group_bits_bound(64, best=False)
    IT = int(os.environ.get("QB3_PROF_ITERS", "150"))
    dimg = jax.device_put(jnp.asarray(img))
    p0 = jnp.zeros(nb, jnp.uint64)
    r0 = jnp.zeros(nb, jnp.int32)

    fa = jax.jit(lambda im: encode_fast_blocks(im, p0, r0, HILBERT, (0,),
                                               True, with_rungs=True))
    ra = fa(dimg)
    codes = jax.block_until_ready(ra[0])
    lens = jax.block_until_ready(ra[1])
    gl = np.asarray(jnp.sum(lens.astype(jnp.int32), axis=1))
    print(f"max group bits actual: {gl.max()} (static bound {maxbits})")

    for mb in sorted({maxbits, int(gl.max()),
                      ((int(gl.max()) + 63) // 64) * 64}):
        W = (31 + mb + 31) // 32
        W48 = -(-(W + 7) // 8) * 8
        f = jax.jit(lambda c, l, mb=mb: pack_groups_chunked(c, l, n_words, mb))
        wv, tot, _ = f(codes, lens)
        t = sustained(lambda: f(codes, lens), IT)
        print(f"pack maxbits={mb:5d} (W48={W48:3d}): {1e3*t:7.3f} ms "
              f"{raw_mb/t:7.0f} MB/s")

    # prep-only: everything pack_groups_chunked does before pallas_call
    def prep(codes, lens):
        ngroups, S = codes.shape
        lens_i = lens.astype(jnp.int32)
        glen = jnp.sum(lens_i, axis=1)
        gend = jnp.cumsum(glen.astype(jnp.int64))
        goff = gend - glen
        base = (goff >> 5).astype(jnp.int32)
        phase = (goff & 31).astype(jnp.int32)
        lensT = jnp.transpose(lens_i)
        c2 = jax.lax.bitcast_convert_type(codes, jnp.uint32)
        codeT = jnp.transpose(c2.reshape(-1, 2 * S))
        return base, phase, lensT, codeT, gend[-1]

    fprep = jax.jit(prep)
    jax.block_until_ready(fprep(codes, lens))
    t_pr = sustained(lambda: fprep(codes, lens), IT)
    print(f"prep only:                 {1e3*t_pr:7.3f} ms")


if __name__ == "__main__":
    main()

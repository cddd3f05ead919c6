"""Encode-pipeline knob sweep on the real chip: pack variants/tiles,
fold structure, batch width."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def sustained(fn, iters=20):
    from qb3_tpu.benchutil import sustained as _s
    return _s(fn, iters)


def main():
    import jax
    import jax.numpy as jnp

    from qb3_tpu.api import max_encoded_size
    from qb3_tpu.constants import HILBERT
    from qb3_tpu.ops import bitpack
    from qb3_tpu.ops.encode import encode_fast_blocks
    from qb3_tpu.ops.pack_pallas import place_slabs

    from bench import natural_image

    h, w, nb = 512, 512, 3
    img = natural_image(h, w, nb)
    raw_mb = img.nbytes / 1e6
    n_words = (max_encoded_size(w, h, nb, 0) + 3) // 4 + 2
    maxbits = bitpack.group_bits_bound(8, best=False)
    p0 = jnp.zeros(nb, jnp.uint8)
    r0 = jnp.zeros(nb, jnp.int32)

    def full(pack):
        def run(im):
            codes, lens, xp, xr = encode_fast_blocks(im, p0, r0, HILBERT,
                                                     (1, 1, 1), True)
            return pack(codes, lens)
        return jax.jit(run)

    def pack_pallas_gs(G, sub):
        def p(codes, lens):
            slab, base, glen, total, W = bitpack._fold_slabs(codes, lens, maxbits)
            ngroups = slab.shape[0]
            pad = (-ngroups) % G
            if pad:
                slab = jnp.concatenate([slab, jnp.zeros((pad, W), jnp.uint32)])
                base = jnp.concatenate([base, jnp.broadcast_to(base[-1], (pad,))])
            R = -(-((G * maxbits) // 32 + W + 128 + 2) // 128) * 128
            return place_slabs(slab, base, n_words, G, W, R, sub=sub)[0, :n_words], total
        return p

    dimg = jax.device_put(jnp.asarray(img))
    cases = [
        ("pack pallas G256 sub16 (current)", full(pack_pallas_gs(256, 16))),
        ("pack pallas G128 sub32", full(pack_pallas_gs(128, 32))),
        ("pack pallas G64 sub32", full(pack_pallas_gs(64, 32))),
        ("pack pallas G256 sub32", full(pack_pallas_gs(256, 32))),
        ("pack scatter", full(lambda c, l: bitpack.pack_groups(c, l, n_words, maxbits)[:2])),
    ]
    for name, fn in cases:
        try:
            t = sustained(lambda: fn(dimg))
            print(f"{name:36s}: {1e3*t:7.3f} ms  {raw_mb/t:6.0f} MB/s", flush=True)
        except Exception as e:
            print(f"{name:36s}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)

    # batch widths (amortize the dispatch floor)
    from qb3_tpu.batch import _batch_encode_kernel
    for NB in (16, 32):
        tiles = np.stack([natural_image(h, w, nb, seed=100 + i) for i in range(NB)])
        ek = _batch_encode_kernel(NB, (h, w, nb), "uint8", HILBERT, (1, 1, 1),
                                  True, n_words)
        dt = jax.device_put(jnp.asarray(tiles))
        t = sustained(lambda: ek(dt), 10) / NB
        print(f"batch{NB} encode: {raw_mb/t:6.0f} MB/s/tile", flush=True)


if __name__ == "__main__":
    main()

"""Locate the batch-128 u8 decode collapse (BENCH r3: 139.8 MB/s vs 408
single-dispatch): time the vmapped kernel against per-variant ablations."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.api import _indexed_window_R, max_encoded_size
    from qb3_tpu.benchutil import sustained
    from qb3_tpu.constants import HILBERT, B2
    from qb3_tpu.ops.decode import decode_indexed_narrow, payload_words, reconstruct

    from bench import natural_image

    h, w, nb = 512, 512, 3
    NB = int(os.environ.get("NB", "128"))
    tiles = np.stack([natural_image(h, w, nb, seed=100 + i) for i in range(NB)])
    raw_mb = tiles[0].nbytes / 1e6
    nblocks = (h // 4) * (w // 4)

    from qb3_tpu.batch import encode_tiles
    streams = encode_tiles(tiles, mode=qb3_tpu.Mode.FTL, index=True)
    infos = [container.parse_headers(s) for s in streams]
    wl = [payload_words(s[i.data_offset:]) for s, i in zip(streams, infos)]
    nwb = 1 << max(4, int(np.ceil(np.log2(max(len(x) for x in wl)))))
    wp = np.zeros((NB, nwb), np.uint64)
    for j, x in enumerate(wl):
        wp[j, : len(x)] = x
    gl = np.stack([np.frombuffer(i.index, dtype="<u2").astype(np.int32)
                   for i in infos])
    R = max(_indexed_window_R(g, 8) for g in gl)
    dwp = jax.device_put(jnp.asarray(wp))
    dgl = jax.device_put(jnp.asarray(gl))
    print(f"NB={NB} nwb={nwb} R={R}")

    def variant(name, use_pallas):
        def one(words64, glens):
            g = decode_indexed_narrow(words64, glens, nblocks, nb, False,
                                      use_pallas, 8, R)
            g = g.reshape(nblocks, nb, B2)
            img, _ = reconstruct(g, jnp.zeros(nb, jnp.uint64), h, w, nb,
                                 HILBERT, (1, 1, 1), np.uint8)
            return img
        k = jax.jit(jax.vmap(one))
        out = k(dwp, dgl)
        assert (np.asarray(out) == tiles).all(), name
        t = sustained(lambda: k(dwp, dgl), 10) / NB
        print(f"{name}: {raw_mb/t:.1f} MB/s/tile")

    variant("vmap pallas-gather", True)
    variant("vmap xla-gather", False)

    # wavefront only (no reconstruct)
    def wave_only(words64, glens):
        return decode_indexed_narrow(words64, glens, nblocks, nb, False,
                                     True, 8, R)
    k = jax.jit(jax.vmap(wave_only))
    jax.block_until_ready(k(dwp, dgl))
    t = sustained(lambda: k(dwp, dgl), 10) / NB
    print(f"vmap wavefront-only (pallas): {raw_mb/t:.1f} MB/s/tile")

    def wave_only_x(words64, glens):
        return decode_indexed_narrow(words64, glens, nblocks, nb, False,
                                     False, 8, R)
    k = jax.jit(jax.vmap(wave_only_x))
    jax.block_until_ready(k(dwp, dgl))
    t = sustained(lambda: k(dwp, dgl), 10) / NB
    print(f"vmap wavefront-only (xla): {raw_mb/t:.1f} MB/s/tile")

    # reconstruct only
    g0 = jax.vmap(lambda wd, gls: decode_indexed_narrow(
        wd, gls, nblocks, nb, False, True, 8, R).reshape(nblocks, nb, B2))(dwp, dgl)
    g0 = jax.device_put(np.asarray(g0))
    def rec(g):
        img, _ = reconstruct(g, jnp.zeros(nb, jnp.uint64), h, w, nb,
                             HILBERT, (1, 1, 1), np.uint8)
        return img
    k = jax.jit(jax.vmap(rec))
    jax.block_until_ready(k(g0))
    t = sustained(lambda: k(g0), 10) / NB
    print(f"vmap reconstruct-only: {raw_mb/t:.1f} MB/s/tile")


if __name__ == "__main__":
    main()

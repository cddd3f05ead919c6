"""Batched "ic" chunk-parallel decode: the walk is op-issue-bound (fixed
sequential step count), so vmapping tiles should amortize it almost for
free — making SELF-CONTAINED (~1% overhead) parallel decode competitive
with the ix fast path."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def sustained(fn, iters=15):
    from qb3_tpu.benchutil import sustained as _s
    return _s(fn, iters)


def main():
    import jax
    import jax.numpy as jnp

    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.api import DT_FROM_NP, Encoder
    from qb3_tpu.constants import HILBERT, B2
    from qb3_tpu.ops.decode import payload_words, reconstruct
    from qb3_tpu.ops.decode_chunked import decode_chunked, parse_ic

    from bench import natural_image

    h, w, nb = 512, 512, 3
    nblocks = (h // 4) * (w // 4)
    for NB in (8, 16):
        for K in (8, 16):
            tiles = np.stack([natural_image(h, w, nb, seed=300 + i)
                              for i in range(NB)])
            streams = []
            for i in range(NB):
                e = Encoder(w, h, nb, DT_FROM_NP[np.dtype(np.uint8)])
                e.set_mode(qb3_tpu.Mode.FTL)
                e.with_index = "ic"
                e.index_chunk_blocks = K
                streams.append(e.encode(tiles[i]))
            infos = [container.parse_headers(s) for s in streams]
            metas = [parse_ic(i.index_chunked, nblocks, nb) for i in infos]
            wl = [payload_words(s[i.data_offset:]) for s, i in zip(streams, infos)]
            nw = 1 << max(4, int(np.ceil(np.log2(max(len(x) for x in wl)))))
            wp = np.zeros((NB, nw), np.uint64)
            for j, x in enumerate(wl):
                wp[j, : len(x)] = x
            starts = np.stack([m[1].astype(np.int32) for m in metas])
            entries = np.stack([m[2] for m in metas])
            ov = 100 * sum(len(i.index_chunked) for i in infos) / sum(map(len, streams))

            def one(w64, st, en):
                g = decode_chunked(w64, st, en, K, nblocks, nb, False, 8)
                img, _ = reconstruct(g.reshape(nblocks, nb, B2),
                                     jnp.zeros(nb, jnp.uint64), h, w, nb,
                                     HILBERT, (1, 1, 1), np.uint8)
                return img

            kern = jax.jit(jax.vmap(one))
            dw = jax.device_put(jnp.asarray(wp))
            ds = jax.device_put(jnp.asarray(starts))
            de = jax.device_put(jnp.asarray(entries))
            out = kern(dw, ds, de)
            ok = (np.asarray(out) == tiles).all()
            t = sustained(lambda: kern(dw, ds, de)) / NB
            mb = tiles[0].nbytes / 1e6
            print(f"ic batch{NB} K={K}: {mb/t:7.1f} MB/s/tile ok={ok} "
                  f"sidecar={ov:.2f}%", flush=True)


if __name__ == "__main__":
    main()

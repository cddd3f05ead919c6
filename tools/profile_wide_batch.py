"""Batched wide-type (u64/u16x8) device rates: does amortizing the
dispatch floor take 64-bit data to GB/s?"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def sustained(fn, iters=10):
    from qb3_tpu.benchutil import sustained as _s
    return _s(fn, iters)


def main():
    import jax
    import jax.numpy as jnp

    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.api import _indexed_window_R, max_encoded_size
    from qb3_tpu.batch import _batch_decode_kernel, _batch_encode_kernel
    from qb3_tpu.constants import HILBERT
    from qb3_tpu.ops.decode import payload_words

    from bench import natural_image

    for name, npdt, mult, h, w, nb, NB in [
        ("uint64", np.uint64, 1 << 40, 1024, 1024, 1, 4),
        ("uint16x8", np.uint16, 257, 512, 512, 8, 8),
    ]:
        tiles8 = np.stack([natural_image(h, w, nb, seed=400 + i)
                           for i in range(NB)])
        tiles = tiles8.astype(npdt) * npdt(mult)
        raw_mb = tiles[0].nbytes / 1e6
        dt_code = {np.uint16: 2, np.uint64: 6}[npdt]
        cband = tuple(range(nb))
        n_words = (max_encoded_size(w, h, nb, dt_code) + 3) // 4 + 2
        ek = _batch_encode_kernel(NB, (h, w, nb), np.dtype(npdt).name,
                                  HILBERT, cband, True, n_words)
        dt = jax.device_put(jnp.asarray(tiles))
        t_enc = sustained(lambda: ek(dt)) / NB

        streams = [qb3_tpu.encode(tiles[i], mode=qb3_tpu.Mode.FTL, index=True,
                                  coreband=cband) for i in range(NB)]
        infos = [container.parse_headers(s) for s in streams]
        wl = [payload_words(s[i.data_offset:]) for s, i in zip(streams, infos)]
        nw = 1 << max(4, int(np.ceil(np.log2(max(len(x) for x in wl)))))
        wp = np.zeros((NB, nw), np.uint64)
        for j, x in enumerate(wl):
            wp[j, : len(x)] = x
        gl = np.stack([np.frombuffer(i.index, dtype="<u2").astype(np.int32)
                       for i in infos])
        nblocks = (h // 4) * (w // 4)
        tb = np.dtype(npdt).itemsize * 8
        R = max(_indexed_window_R(g, tb) for g in gl)
        dk = _batch_decode_kernel(NB, nblocks, nb, h, w, HILBERT, cband,
                                  False, np.dtype(npdt).name, nw, R)
        dwp, dgl = jax.device_put(jnp.asarray(wp)), jax.device_put(jnp.asarray(gl))
        out = dk(dwp, dgl)
        ok = (np.asarray(out) == tiles).all()
        t_dec = sustained(lambda: dk(dwp, dgl)) / NB
        print(f"{name} {h}x{w}x{nb} batch{NB}: enc {raw_mb/t_enc:.0f} MB/s/tile, "
              f"dec {raw_mb/t_dec:.0f} MB/s/tile ok={ok}", flush=True)


if __name__ == "__main__":
    main()

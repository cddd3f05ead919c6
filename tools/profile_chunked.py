"""Real-chip rates for the "ic" chunk-parallel decode vs the "ix" indexed
wavefront, across chunk sizes and dtypes."""

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

    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.api import (DT_FROM_NP, Encoder, _decode_kernel_chunked,
                             _decode_kernel_indexed, _ic_static_params,
                             _indexed_window_R)
    from qb3_tpu.constants import HILBERT
    from qb3_tpu.ops.decode import payload_words
    from qb3_tpu.ops.decode_chunked import parse_ic

    from bench import natural_image

    print(f"platform: {jax.default_backend()}", flush=True)

    cases = [
        (np.uint8, 1, 512, 512, 3),
        (np.uint16, 257, 512, 512, 1),
        (np.uint64, 1 << 40, 256, 256, 1),
    ]
    for npdt, mult, h, w, nb in cases:
        name = np.dtype(npdt).name
        img8 = natural_image(h, w, nb, seed=5)
        img = img8.astype(npdt) * npdt(mult) if mult != 1 else img8
        raw_mb = img.nbytes / 1e6
        nblocks = (h // 4) * (w // 4)

        # --- ix indexed wavefront (existing fast path)
        six = qb3_tpu.encode(img, mode=qb3_tpu.Mode.FTL, index=True)
        info = container.parse_headers(six)
        payload = six[info.data_offset:]
        wordsv = payload_words(payload)
        nw = 1 << max(4, int(np.ceil(np.log2(len(wordsv)))))
        wpad = np.zeros(nw, np.uint64)
        wpad[: len(wordsv)] = wordsv
        glens = np.frombuffer(info.index, dtype="<u2").astype(np.int32)
        tb = np.dtype(npdt).itemsize * 8
        R = _indexed_window_R(glens, tb)
        dk = _decode_kernel_indexed(nblocks, nb, h, w, HILBERT,
                                    tuple(info.cband), False, name, nw, R)
        dw = jax.device_put(jnp.asarray(wpad))
        dg = jax.device_put(jnp.asarray(glens))
        zp = jnp.zeros(nb, dtype=jnp.uint64)
        out = dk(dw, dg, zp)
        ok = (np.asarray(out[0]).reshape(img.shape) == img).all()
        t = sustained(lambda: dk(dw, dg, zp))
        print(f"{name} {h}x{w}x{nb}: ix-decode {raw_mb/t:7.1f} MB/s ok={ok} "
              f"sidecar={100*2*len(glens)/len(six):.1f}%", flush=True)

        # --- ic chunked walk at several K
        for k in (8, 16, 32, 64):
            e = Encoder(w, h, nb, DT_FROM_NP[np.dtype(npdt)])
            e.set_mode(qb3_tpu.Mode.FTL)
            e.with_index = "ic"
            e.index_chunk_blocks = k
            sic = e.encode(img.reshape(h, w, nb))
            ic_info = container.parse_headers(sic)
            kk, starts, entry, _total = parse_ic(ic_info.index_chunked, nblocks, nb)
            maxw, Ric = _ic_static_params(starts, _total, npdt)
            dkc = _decode_kernel_chunked(nblocks, nb, h, w, HILBERT,
                                         tuple(ic_info.cband), False, name,
                                         nw, kk, maxw, Ric)
            ds = jax.device_put(jnp.asarray(starts.astype(np.int32)))
            de = jax.device_put(jnp.asarray(entry))
            try:
                out = dkc(dw, ds, de, zp)
                ok = (np.asarray(out[0]).reshape(img.shape) == img).all()
                t = sustained(lambda: dkc(dw, ds, de, zp))
                ov = 100 * (len(sic) - (len(six) - 2 * len(glens) - 4)) / len(sic)
                print(f"  ic K={k:3d}: {raw_mb/t:7.1f} MB/s ok={ok} "
                      f"sidecar={100*(len(ic_info.index_chunked))/len(sic):.2f}%",
                      flush=True)
            except Exception as ex:
                print(f"  ic K={k:3d}: FAILED {type(ex).__name__}: {str(ex)[:100]}",
                      flush=True)


if __name__ == "__main__":
    main()

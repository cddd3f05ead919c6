"""Wide-type (u32/u64) device encode/decode rates on the real chip.

Measures the existing paths: device encode (fast kernel), device decode via
the "ix" sidecar (indexed_meta + decode_groups), and the host native walk,
for several image sizes — to locate the u64 bottleneck (VERDICT item 1).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sustained(fn, iters=20):
    from qb3_tpu.benchutil import sustained as _s
    return _s(fn, iters)


def main():
    import jax
    import jax.numpy as jnp

    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.api import _decode_kernel_indexed, _fast_kernel, max_encoded_size
    from qb3_tpu.constants import HILBERT
    from qb3_tpu.ops.decode import payload_words

    from bench import natural_image  # repo root on sys.path via cwd

    for npdt, mult, h, w in [(np.uint64, 1 << 40, 256, 256),
                             (np.uint64, 1 << 40, 1024, 1024),
                             (np.uint32, 1 << 16, 1024, 1024),
                             (np.uint16, 257, 1024, 1024)]:
        name = np.dtype(npdt).name
        img = (natural_image(h, w, 1, seed=7).astype(npdt) * npdt(mult))
        raw_mb = img.nbytes / 1e6
        dt_code = {np.uint16: 2, np.uint32: 4, np.uint64: 6}[npdt]

        # encode (device resident)
        nw = (max_encoded_size(w, h, 1, dt_code) + 3) // 4 + 2
        ek = _fast_kernel((h, w, 1), name, HILBERT, (0,), True, nw)
        dimg = jax.device_put(jnp.asarray(img))
        p0 = jnp.zeros(1, npdt)
        r0 = jnp.zeros(1, jnp.int32)
        t_enc = sustained(lambda: ek(dimg, p0, r0), 10)
        print(f"{name} {h}x{w}: device encode {raw_mb/t_enc:.1f} MB/s", flush=True)

        # decode via ix sidecar (device path)
        s = qb3_tpu.encode(img, mode=qb3_tpu.Mode.FTL, index=True)
        info = container.parse_headers(s)
        payload = s[info.data_offset:]
        wordsv = payload_words(payload)
        nwd = 1 << max(4, int(np.ceil(np.log2(len(wordsv)))))
        wpad = np.zeros(nwd, np.uint64)
        wpad[: len(wordsv)] = wordsv
        glens = np.frombuffer(info.index, dtype="<u2").astype(np.int32)
        nblocks = (h // 4) * (w // 4)
        dk = _decode_kernel_indexed(nblocks, 1, h, w, HILBERT, (0,), False,
                                    name, nwd)
        dw = jax.device_put(jnp.asarray(wpad))
        dg = jax.device_put(jnp.asarray(glens))
        zp = jnp.zeros(1, dtype=jnp.uint64)
        out = dk(dw, dg, zp)
        ok = (np.asarray(out[0]).reshape(img.shape) == img).all()
        t_dec = sustained(lambda: dk(dw, dg, zp), 10)
        print(f"{name} {h}x{w}: device decode(ix) {raw_mb/t_dec:.1f} MB/s "
              f"correct={ok} ratio={100*len(s)/img.nbytes:.1f}% "
              f"sidecar={100*2*len(glens)/len(s):.2f}%", flush=True)


if __name__ == "__main__":
    main()

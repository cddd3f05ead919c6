"""Correctness + timing check of the fused window-build decode kernel."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.api import _indexed_nreg, _indexed_window_R
    from qb3_tpu.benchutil import sustained
    from qb3_tpu.ops.decode import decode_indexed_narrow, payload_words
    from qb3_tpu.ops.fusedwin_pallas import fused_params

    from bench import natural_image

    for npdt, mult, h, w, nb in [(np.uint64, 1 << 40, 1024, 1024, 1),
                                 (np.uint16, 257, 1024, 1024, 1),
                                 (np.uint8, 1, 512, 512, 3)]:
        tbits = np.dtype(npdt).itemsize * 8
        img = natural_image(h, w, nb, seed=7).astype(npdt) * npdt(mult)
        raw_mb = img.nbytes / 1e6
        stream = qb3_tpu.encode(img, mode=qb3_tpu.Mode.FTL, index=True)
        info = container.parse_headers(stream)
        wordsv = payload_words(stream[info.data_offset:])
        glens = np.frombuffer(info.index, dtype="<u2").astype(np.int32)
        nblocks = (h // 4) * (w // 4)
        dwords = jax.device_put(jnp.asarray(wordsv))
        dglens = jax.device_put(jnp.asarray(glens))
        R = _indexed_window_R(glens, tbits)
        nreg = _indexed_nreg(glens, tbits)
        fused = fused_params(glens, tbits)
        print(f"{np.dtype(npdt).name}: R={R} nreg={nreg} fused={fused}",
              flush=True)

        f_old = jax.jit(lambda wd, gl: decode_indexed_narrow(
            wd, gl, nblocks, nb, True, True, tbits, R, nreg=nreg))
        f_new = jax.jit(lambda wd, gl: decode_indexed_narrow(
            wd, gl, nblocks, nb, True, True, tbits, R, fused=fused))
        t0 = time.time()
        g_old = np.asarray(jax.block_until_ready(f_old(dwords, dglens)))
        print(f"  old compile {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        g_new = np.asarray(jax.block_until_ready(f_new(dwords, dglens)))
        print(f"  new compile {time.time()-t0:.1f}s", flush=True)
        if not np.array_equal(g_old, g_new):
            bad = np.argwhere(g_old != g_new)
            print(f"  MISMATCH {bad.shape[0]} cells, first {bad[:5]}")
            print(f"  old {g_old[bad[0][0]]}\n  new {g_new[bad[0][0]]}")
            sys.exit(1)
        t_old = sustained(lambda: f_old(dwords, dglens))
        t_new = sustained(lambda: f_new(dwords, dglens))
        print(f"  EXACT; old {1e3*t_old:.3f} ms ({raw_mb/t_old:.0f} MB/s)"
              f" -> new {1e3*t_new:.3f} ms ({raw_mb/t_new:.0f} MB/s)",
              flush=True)


if __name__ == "__main__":
    main()

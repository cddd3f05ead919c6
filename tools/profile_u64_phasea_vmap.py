"""Which phase-A sub-stage regresses under vmap (u64 batch 8)?"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from qb3_tpu.benchutil import sustained
    from qb3_tpu.constants import HILBERT
    from qb3_tpu.ops.encode import (block_rungs, delta_mags, fast_symbols,
                                    gather_blocks)

    from bench import natural_image

    NB, h, w, nb = 8, 1024, 1024, 1
    tiles = np.stack([
        natural_image(h, w, nb, seed=300 + i).astype(np.uint64)
        * np.uint64(1 << 40) for i in range(NB)])
    raw_mb = tiles.nbytes / 1e6
    IT = int(os.environ.get("QB3_PROF_ITERS", "30"))
    dtiles = jax.device_put(jnp.asarray(tiles))
    zp = jnp.zeros(nb, dtype=jnp.uint64)
    zr = jnp.zeros(nb, jnp.int32)
    cband = (0,)
    print(f"u64 batch{NB} raw {raw_mb:.1f} MB, iters={IT}")

    def stage(name, f, *args):
        ff = jax.jit(f)
        r = jax.block_until_ready(ff(*args))
        t = sustained(lambda: ff(*args), IT)
        print(f"  {name:20s} {1e3*t:8.3f} ms  {raw_mb/t:7.0f} MB/s"
              f"  ({1e3*t/NB:.3f} ms/tile)")
        return r

    g = stage("vmap gather_blocks",
              jax.vmap(lambda im: gather_blocks(im, HILBERT, cband)), dtiles)
    dm = stage("vmap delta_mags",
               jax.vmap(lambda v: delta_mags(v, zp)), g)
    m = dm[0]
    br = stage("vmap block_rungs",
               jax.vmap(lambda mm: block_rungs(mm, zr)), m)
    bitsused, rung, oldrung, _ = br
    stage("vmap fast_symbols",
          jax.vmap(lambda a, b, c, d: fast_symbols(a, b, c, d, 6, True)),
          m, bitsused, rung, oldrung)

    # single-tile baselines for the same stages
    d0 = dtiles[0]
    g0 = stage("one gather_blocks",
               lambda im: gather_blocks(im, HILBERT, cband), d0)
    dm0 = stage("one delta_mags", lambda v: delta_mags(v, zp), g0)
    m0 = dm0[0]
    br0 = stage("one block_rungs", lambda mm: block_rungs(mm, zr), m0)
    stage("one fast_symbols",
          lambda a, b, c, d: fast_symbols(a, b, c, d, 6, True),
          m0, br0[0], br0[1], br0[2])


if __name__ == "__main__":
    main()

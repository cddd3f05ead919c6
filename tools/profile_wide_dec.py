"""u64 decode stage timing with the real stream (gather + wavefront split)."""

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
    from qb3_tpu.api import _indexed_window_R
    from qb3_tpu.constants import HILBERT, B2
    from qb3_tpu.ops.decode import (_NREG_IX, decode_indexed_narrow,
                                    payload_words, reconstruct)
    from qb3_tpu.ops.gather import gather_slabs_onehot, gather_slabs_onehot8

    from bench import natural_image

    npdt, mult, h, w = np.uint64, 1 << 40, 1024, 1024
    tbits, nb = 64, 1
    img = natural_image(h, w, 1, seed=7).astype(npdt) * npdt(mult)
    raw_mb = img.nbytes / 1e6
    stream = qb3_tpu.encode(img, mode=qb3_tpu.Mode.FTL, index=True)
    info = container.parse_headers(stream)
    wordsv = payload_words(stream[info.data_offset:])
    nw = 1 << max(4, int(np.ceil(np.log2(len(wordsv)))))
    wpad = np.zeros(nw, np.uint64)
    wpad[: len(wordsv)] = wordsv
    glens = np.frombuffer(info.index, dtype="<u2").astype(np.int32)
    nblocks = (h // 4) * (w // 4)
    dwords = jax.device_put(jnp.asarray(wpad))
    dglens = jax.device_put(jnp.asarray(glens))
    Rd = _indexed_window_R(glens, tbits)
    NREG = _NREG_IX[tbits]
    print(f"Rd={Rd} NREG={NREG} ngroups={nblocks}", flush=True)

    for name, gfn in [("new8", gather_slabs_onehot8),
                      ("old", gather_slabs_onehot)]:
        def gather_only(wd, gl):
            ends = jnp.cumsum(gl.astype(jnp.int32))
            goff = ends - gl
            base = (goff >> 5).astype(jnp.int32)
            words32 = jax.lax.bitcast_convert_type(wd, jnp.uint32).reshape(-1)
            G = 128
            ngroups = base.shape[0]
            pad = (-ngroups) % G
            basep = jnp.concatenate(
                [base, jnp.broadcast_to(base[-1], (pad,))]) if pad else base
            return gfn(words32, basep, G, NREG, Rd)

        f = jax.jit(gather_only)
        t0 = time.time()
        jax.block_until_ready(f(dwords, dglens))
        print(f"{name} gather compile {time.time()-t0:.1f}s", flush=True)
        t = sustained(lambda: f(dwords, dglens))
        print(f"{name} gather: {1e3*t:.3f} ms", flush=True)

    f_dec = jax.jit(lambda wd, gl: decode_indexed_narrow(
        wd, gl, nblocks, nb, False, True, tbits, Rd))
    t0 = time.time()
    g = jax.block_until_ready(f_dec(dwords, dglens))
    print(f"wavefront compile {time.time()-t0:.1f}s", flush=True)
    t_wave = sustained(lambda: f_dec(dwords, dglens))
    print(f"decode wavefront (incl gather): {1e3*t_wave:.3f} ms  "
          f"{raw_mb/t_wave:.0f} MB/s", flush=True)


if __name__ == "__main__":
    main()

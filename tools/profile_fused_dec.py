"""Stage breakdown of the fused indexed decode path (u64)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.api import _indexed_window_R
    from qb3_tpu.benchutil import sustained
    from qb3_tpu.ops.decode import payload_words, dsw_arith
    from qb3_tpu.ops.fusedwin_pallas import fused_params, wavefront_fused
    from qb3_tpu.ops.gather import gather_slabs_onehot8

    from bench import natural_image

    npdt, mult, h, w, nb = np.uint64, 1 << 40, 1024, 1024, 1
    tbits = 64
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
    NREGW, R8, R8sub = fused_params(glens, tbits)
    print(f"R={R} NREGW={NREGW} R8={R8} R8sub={R8sub}", flush=True)

    def prep(wd, gl):
        ends = jnp.cumsum(gl.astype(jnp.int32))
        goff = ends - gl
        base = (goff >> 5).astype(jnp.int32)
        words32 = jax.lax.bitcast_convert_type(wd, jnp.uint32).reshape(-1)
        return goff, base, words32

    def minigather(wd, gl):
        goff, base, words32 = prep(wd, gl)
        return gather_slabs_onehot8(words32, base, 128, 2, R)

    def csparse(wd, gl):
        goff, base, words32 = prep(wd, gl)
        w2 = gather_slabs_onehot8(words32, base, 128, 2, R)
        sh = (goff & 31).astype(jnp.uint32)
        w0 = jnp.where(sh == 0, w2[:, 0],
                       (w2[:, 0] >> sh) | (w2[:, 1] << ((32 - sh) & 31)))
        has_cs = (w0 & 1) == 1
        dlen, dd = dsw_arith(w0 >> 1, 6)
        cs_len = jnp.where(has_cs, dlen, 1)
        delta = jnp.where(has_cs, dd, 0)
        rung = (jnp.cumsum(delta.reshape(nblocks, nb), axis=0) & 63).reshape(-1)
        rung0 = rung == 0
        flag = ((w0 >> cs_len.astype(jnp.uint32)) & 1).astype(jnp.int32)
        kind = jnp.where(rung0, jnp.where(flag == 1, 2, 0), 1)
        base8 = (goff >> 8).astype(jnp.int32)
        off8 = (goff & 255).astype(jnp.int32) + cs_len + jnp.where(rung0, 1, 0)
        return base8, off8, rung, kind, words32

    def full(wd, gl):
        base8, off8, rung, kind, words32 = csparse(wd, gl)
        return wavefront_fused(words32, base8, off8, rung, kind, NREGW,
                               tbits, R8, R8sub)

    # kernel-only: fixed prebuilt metadata
    base8_h, off8_h, rung_h, kind_h, w32 = jax.jit(csparse)(dwords, dglens)
    base8_h, off8_h, rung_h, kind_h = (jax.device_put(x) for x in
                                       (base8_h, off8_h, rung_h, kind_h))
    w32 = jax.device_put(w32)

    def kernel_only(w32_, b8, o8, ru, ki):
        return wavefront_fused(w32_, b8, o8, ru, ki, NREGW, tbits, R8, R8sub)

    for name, f, args in [
        ("minigather", minigather, (dwords, dglens)),
        ("csparse   ", csparse, (dwords, dglens)),
        ("kernel    ", kernel_only, (w32, base8_h, off8_h, rung_h, kind_h)),
        ("full      ", full, (dwords, dglens)),
    ]:
        jf = jax.jit(f)
        t0 = time.time()
        jax.block_until_ready(jf(*args))
        tc = time.time() - t0
        t = sustained(lambda: jf(*args))
        print(f"{name}: {1e3*t:7.3f} ms  {raw_mb/t:6.0f} MB/s "
              f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

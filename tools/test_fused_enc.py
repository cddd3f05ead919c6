"""Correctness + timing of the fused image-layout encode kernel."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from qb3_tpu.benchutil import sustained
    from qb3_tpu.constants import HILBERT, ubits_for
    from qb3_tpu.ops.bitpack import group_bits_bound, pack_groups_auto
    from qb3_tpu.ops.encode import encode_fast_blocks
    from qb3_tpu.ops.encode_image import phase_a_image
    from qb3_tpu.ops.encode_pallas import encode_pack_image

    from bench import natural_image

    for npdt, mult, h, w, nb, skipstep in [
            (np.uint64, 1 << 40, 1024, 1024, 1, True),
            (np.uint64, 1 << 40, 1024, 1024, 1, False),
            (np.uint16, 257, 1024, 1024, 1, True),
            (np.uint16, 251, 512, 512, 8, True),
            (np.uint32, 1 << 20, 512, 512, 3, True)]:
        tbits = np.dtype(npdt).itemsize * 8
        name = f"{np.dtype(npdt).name} {h}x{w}x{nb} skip={skipstep}"
        img = (natural_image(h, w, nb, seed=7).astype(npdt) * npdt(mult))
        raw_mb = img.nbytes / 1e6
        cband = tuple(range(nb)) if nb != 3 else (1, 1, 1)
        maxbits = group_bits_bound(tbits, best=False)
        n_words = img.nbytes // 4 + 4096
        ep = jnp.zeros(nb, jnp.uint64).astype(img.dtype)
        er = jnp.zeros(nb, jnp.int32)
        dimg = jax.device_put(jnp.asarray(img))

        def old(im):
            codes, lens, xp, xr, rung = encode_fast_blocks(
                im, ep, er, HILBERT, cband, skipstep, with_rungs=True)
            return pack_groups_auto(codes, lens, n_words, maxbits)

        def new(im):
            o = phase_a_image(im, ep, er, HILBERT, cband, skipstep)
            return encode_pack_image(
                o["m_lo"], o["m_hi"], o["rung"].reshape(-1), o["gkind"],
                o["prefix_code"].reshape(-1),
                o["prefix_len"].reshape(-1), o["glen"], tbits, n_words,
                maxbits, w // 4, nb, HILBERT)

        fo, fn = jax.jit(old), jax.jit(new)
        t0 = time.time()
        wo, to, go = jax.block_until_ready(fo(dimg))
        print(f"{name}: old compile {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        wn, tn, gn = jax.block_until_ready(fn(dimg))
        print(f"{name}: new compile {time.time()-t0:.0f}s", flush=True)
        to_, tn_ = int(to), int(tn)
        wo_np = np.asarray(wo)[: (to_ + 31) // 32]
        wn_np = np.asarray(wn)[: (tn_ + 31) // 32]
        if to_ != tn_ or not np.array_equal(wo_np, wn_np) or \
                not np.array_equal(np.asarray(go), np.asarray(gn)):
            print(f"  MISMATCH total {to_} vs {tn_}")
            if to_ == tn_:
                bad = np.argwhere(wo_np != wn_np).reshape(-1)
                print(f"  {bad.size} bad words, first at {bad[:5]}")
                for b in bad[:3]:
                    print(f"   [{b}] {wo_np[b]:08x} vs {wn_np[b]:08x}")
            sys.exit(1)
        t_old = sustained(lambda: fo(dimg))
        t_new = sustained(lambda: fn(dimg))
        fa = jax.jit(lambda im: phase_a_image(im, ep, er, HILBERT, cband,
                                              skipstep))
        jax.block_until_ready(fa(dimg))
        t_a = sustained(lambda: fa(dimg))
        print(f"  EXACT; old {1e3*t_old:.2f} ms ({raw_mb/t_old:.0f} MB/s)"
              f" -> new {1e3*t_new:.2f} ms ({raw_mb/t_new:.0f} MB/s)"
              f" [phaseA {1e3*t_a:.2f} ms]", flush=True)


if __name__ == "__main__":
    main()

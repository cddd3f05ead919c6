"""Stage-level timing of the u64 (and u32/u16) encode/decode pipelines.

Locates the wide-type bottleneck (VERDICT r2 item 1): phase A symbol math,
the slab fold (W x S masked passes), Pallas placement, the decode register
gather, the 16-step window wavefront, and reconstruct — each timed as its
own jitted stage on the real chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sustained(fn, iters=10):
    from qb3_tpu.benchutil import sustained as _s
    return _s(fn, iters)


def main():
    import jax
    import jax.numpy as jnp

    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.api import _indexed_window_R, max_encoded_size
    from qb3_tpu.constants import HILBERT, B2
    from qb3_tpu.ops import bitpack, encode as E
    from qb3_tpu.ops.decode import (decode_indexed_narrow, payload_words,
                                    reconstruct)

    from bench import natural_image

    for npdt, mult, h, w in [(np.uint64, 1 << 40, 1024, 1024),
                             (np.uint16, 257, 1024, 1024)]:
        name = np.dtype(npdt).name
        tbits = np.dtype(npdt).itemsize * 8
        img = natural_image(h, w, 1, seed=7).astype(npdt) * npdt(mult)
        raw_mb = img.nbytes / 1e6
        dt_code = {np.uint16: 2, np.uint32: 4, np.uint64: 6}[npdt]
        nb = 1
        print(f"==== {name} {h}x{w} ({raw_mb:.1f} MB)")
        dimg = jax.device_put(jnp.asarray(img))
        p0 = jnp.zeros(nb, npdt)
        r0 = jnp.zeros(nb, jnp.int32)

        # ---------------- encode stages
        f_blocks = jax.jit(lambda im: E.encode_fast_blocks(
            im, p0, r0, HILBERT, (0,), True))
        codes, lens, xp, xr = jax.block_until_ready(f_blocks(dimg))
        t_a = sustained(lambda: f_blocks(dimg))
        print(f"encode phase A (symbols): {1e3*t_a:.3f} ms  {raw_mb/t_a:.0f} MB/s")

        n_words = (max_encoded_size(w, h, nb, dt_code) + 3) // 4 + 2
        maxbits = bitpack.group_bits_bound(tbits, best=False)
        W = (31 + maxbits + 31) // 32
        print(f"  S={codes.shape[1]} W={W} maxbits={maxbits}")

        f_pack = jax.jit(lambda c, l: bitpack.pack_groups_pallas(
            c, l, n_words, maxbits))
        jax.block_until_ready(f_pack(codes, lens))
        t_b = sustained(lambda: f_pack(codes, lens))
        print(f"encode phase B (pack pallas): {1e3*t_b:.3f} ms  {raw_mb/t_b:.0f} MB/s")

        # fold only
        def fold_only(codes, lens):
            return bitpack._fold_slabs(codes, lens, maxbits)[:3]

        f_fold = jax.jit(fold_only)
        jax.block_until_ready(f_fold(codes, lens))
        t_fold = sustained(lambda: f_fold(codes, lens))
        print(f"  fold only: {1e3*t_fold:.3f} ms")

        slab, base, glen = jax.block_until_ready(f_fold(codes, lens))
        from qb3_tpu.ops.pack_pallas import place_slabs
        G = 64
        ngroups = slab.shape[0]
        pad = (-ngroups) % G
        if pad:
            slab = jnp.concatenate([slab, jnp.zeros((pad, W), jnp.uint32)])
            base = jnp.concatenate([base, jnp.broadcast_to(base[-1], (pad,))])
        R = -(-((G * maxbits) // 32 + W + 128 + 2) // 128) * 128
        f_place = jax.jit(lambda s, b: place_slabs(s, b, n_words, G, W, R, sub=32))
        jax.block_until_ready(f_place(slab, base))
        t_place = sustained(lambda: f_place(slab, base))
        print(f"  place pallas (G{G} R{R}): {1e3*t_place:.3f} ms")

        # ---------------- decode stages
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

        f_dec = jax.jit(lambda wd, gl: decode_indexed_narrow(
            wd, gl, nblocks, nb, False, True, tbits, Rd))
        g = jax.block_until_ready(f_dec(dwords, dglens))
        t_wave = sustained(lambda: f_dec(dwords, dglens))
        print(f"decode wavefront (incl gather): {1e3*t_wave:.3f} ms  {raw_mb/t_wave:.0f} MB/s")

        # gather only
        from qb3_tpu.ops.decode import _NREG_IX
        from qb3_tpu.ops.gather import gather_slabs_onehot8
        NREG = _NREG_IX[tbits]

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
            return gather_slabs_onehot8(words32, basep, G, NREG, Rd)

        f_gather = jax.jit(gather_only)
        jax.block_until_ready(f_gather(dwords, dglens))
        t_gather = sustained(lambda: f_gather(dwords, dglens))
        print(f"  gather (onehot NREG={NREG}): {1e3*t_gather:.3f} ms")

        f_rec = jax.jit(lambda g: reconstruct(
            g.reshape(nblocks, nb, B2), jnp.zeros(nb, jnp.uint64), h, w, nb,
            HILBERT, (0,), npdt))
        jax.block_until_ready(f_rec(g))
        t_rec = sustained(lambda: f_rec(g))
        print(f"decode reconstruct: {1e3*t_rec:.3f} ms")


if __name__ == "__main__":
    main()

"""Stage-level timing of the encode/decode pipelines on the real chip.

Times each jitted sub-stage separately to locate the bottleneck; the numbers
are upper bounds on the fused costs (per-dispatch overhead is paid per
stage here, not per pipeline).
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
    from qb3_tpu.api import max_encoded_size
    from qb3_tpu.constants import HILBERT, B2
    from qb3_tpu.ops import bitpack, encode as E
    from qb3_tpu.ops.decode import payload_words

    sys.path.insert(0, "tests")
    from bench import natural_image

    h, w, nb = 512, 512, 3
    img = natural_image(h, w, nb)
    raw_mb = img.nbytes / 1e6
    dimg = jax.device_put(jnp.asarray(img))
    p0 = jnp.zeros(nb, jnp.uint8)
    r0 = jnp.zeros(nb, jnp.int32)

    # ---------------- encode stages
    f_blocks = jax.jit(lambda im: E.encode_fast_blocks(im, p0, r0, HILBERT, (1, 1, 1), True))
    codes, lens, xp, xr = jax.block_until_ready(f_blocks(dimg))
    t_a = sustained(lambda: f_blocks(dimg))
    print(f"encode phase A (symbols): {1e3*t_a:.3f} ms  {raw_mb/t_a:.0f} MB/s")

    # phase A sub-stages (each pays the dispatch floor separately)
    f_g = jax.jit(lambda im: E.gather_blocks(im, HILBERT, (1, 1, 1)))
    vals = jax.block_until_ready(f_g(dimg))
    print(f"  gather_blocks: {1e3*sustained(lambda: f_g(dimg)):.3f} ms")
    f_dm = jax.jit(lambda v: E.delta_mags(v, p0))
    m, _ = jax.block_until_ready(f_dm(vals))
    print(f"  delta_mags: {1e3*sustained(lambda: f_dm(vals)):.3f} ms")
    f_br = jax.jit(lambda m: E.block_rungs(m, r0))
    bu, rng_, oldr, _ = jax.block_until_ready(f_br(m))
    print(f"  block_rungs: {1e3*sustained(lambda: f_br(m)):.3f} ms")
    f_fs = jax.jit(lambda m, b, r, o: E.fast_symbols(m, b, r, o, 3, True))
    jax.block_until_ready(f_fs(m, bu, rng_, oldr))
    print(f"  fast_symbols: {1e3*sustained(lambda: f_fs(m, bu, rng_, oldr)):.3f} ms")

    n_words = (max_encoded_size(w, h, nb, 0) + 3) // 4 + 2
    maxbits = bitpack.group_bits_bound(8, best=False)

    f_pack = jax.jit(lambda c, l: bitpack.pack_groups_pallas(c, l, n_words, maxbits))
    jax.block_until_ready(f_pack(codes, lens))
    t_b = sustained(lambda: f_pack(codes, lens))
    print(f"encode phase B (pack pallas): {1e3*t_b:.3f} ms  {raw_mb/t_b:.0f} MB/s")

    # fold only (slab computation, no placement)
    def fold_only(codes, lens):
        il = jnp.cumsum(lens, axis=1, dtype=jnp.int32)
        glen = il[:, -1]
        io = il - lens
        gend = jnp.cumsum(glen.astype(jnp.int64))
        goff = gend - glen
        phase = (goff & 31).astype(jnp.int32)
        bitpos = phase[:, None] + io
        W = (31 + maxbits + 31) // 32
        k = bitpos >> 5
        sh = (bitpos & 31).astype(jnp.uint64)
        t = codes.astype(jnp.uint64) << sh
        lo = (t & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        mid = (t >> jnp.uint64(32)).astype(jnp.uint32)

        def jbody(_, j):
            acc = jnp.sum(jnp.where(k == j, lo, 0), axis=1, dtype=jnp.uint32)
            acc = acc + jnp.sum(jnp.where(k == j - 1, mid, 0), axis=1, dtype=jnp.uint32)
            return None, acc

        _, slabs = jax.lax.scan(jbody, None, jnp.arange(W, dtype=jnp.int32))
        return jnp.moveaxis(slabs, 0, 1), (goff >> 5).astype(jnp.int32), glen

    f_fold = jax.jit(fold_only)
    jax.block_until_ready(f_fold(codes, lens))
    t_fold = sustained(lambda: f_fold(codes, lens))
    print(f"  fold only: {1e3*t_fold:.3f} ms")

    slab, base, glen = jax.block_until_ready(f_fold(codes, lens))

    from qb3_tpu.ops.pack_pallas import place_slabs
    G = 256
    ngroups = slab.shape[0]
    pad = (-ngroups) % G
    W = (31 + maxbits + 31) // 32
    R = -(-((G * maxbits) // 32 + W + 128 + 2) // 128) * 128
    f_place = jax.jit(lambda s, b: place_slabs(s, b, n_words, G, W, R, sub=16))
    jax.block_until_ready(f_place(slab, base))
    t_place = sustained(lambda: f_place(slab, base))
    print(f"  place pallas: {1e3*t_place:.3f} ms")

    from qb3_tpu.ops.gather import place_slabs_onehot
    G2 = 128
    R2 = -(-((G2 * maxbits) // 32 + W + 128 + 2) // 128) * 128
    f_place2 = jax.jit(lambda s, b: place_slabs_onehot(s, b, n_words, G2, W, R2))
    jax.block_until_ready(f_place2(slab, base))
    t_place2 = sustained(lambda: f_place2(slab, base))
    print(f"  place onehot G128: {1e3*t_place2:.3f} ms")

    f_packo = jax.jit(lambda c, l: bitpack.pack_groups_onehot(c, l, n_words, maxbits))
    jax.block_until_ready(f_packo(codes, lens))
    t_bo = sustained(lambda: f_packo(codes, lens))
    print(f"encode phase B (pack onehot): {1e3*t_bo:.3f} ms  {raw_mb/t_bo:.0f} MB/s")

    # ---------------- decode stages
    stream = qb3_tpu.encode(img, mode=qb3_tpu.Mode.FTL, index=True)
    info = container.parse_headers(stream)
    payload = stream[info.data_offset:]
    wordsv = payload_words(payload)
    nw = 1 << max(4, int(np.ceil(np.log2(len(wordsv)))))
    wpad = np.zeros(nw, np.uint64)
    wpad[: len(wordsv)] = wordsv
    glens = np.frombuffer(info.index, dtype="<u2").astype(np.int32)
    nblocks = (h // 4) * (w // 4)
    dwords = jax.device_put(jnp.asarray(wpad))
    dglens = jax.device_put(jnp.asarray(glens))

    from qb3_tpu.api import _indexed_window_R
    from qb3_tpu.ops.decode import decode_indexed_narrow, reconstruct
    R = _indexed_window_R(glens, 8)

    f_dec = jax.jit(lambda wd, gl: decode_indexed_narrow(wd, gl, nblocks, nb, False, True, 8, R))
    g = jax.block_until_ready(f_dec(dwords, dglens))
    t_wave = sustained(lambda: f_dec(dwords, dglens))
    print(f"decode wavefront (incl gather): {1e3*t_wave:.3f} ms  {raw_mb/t_wave:.0f} MB/s")

    # gather_slabs alone
    from qb3_tpu.ops.pack_pallas import gather_slabs

    def gather_only(wd, gl):
        ends = jnp.cumsum(gl.astype(jnp.int64))
        goff = ends - gl
        base = (goff >> 5).astype(jnp.int32)
        words32 = jax.lax.bitcast_convert_type(wd, jnp.uint32).reshape(-1)
        G = 256
        ngroups = base.shape[0]
        pad = (-ngroups) % G
        basep = jnp.concatenate([base, jnp.broadcast_to(base[-1], (pad,))]) if pad else base
        return gather_slabs(words32, basep, G, 8, R, sub=16)

    f_gather = jax.jit(gather_only)
    jax.block_until_ready(f_gather(dwords, dglens))
    t_gather = sustained(lambda: f_gather(dwords, dglens))
    print(f"  gather_slabs only: {1e3*t_gather:.3f} ms")

    f_rec = jax.jit(lambda g: reconstruct(g.reshape(nblocks, nb, B2),
                                          jnp.zeros(nb, jnp.uint64), h, w, nb,
                                          HILBERT, (1, 1, 1), np.uint8))
    jax.block_until_ready(f_rec(g))
    t_rec = sustained(lambda: f_rec(g))
    print(f"decode reconstruct: {1e3*t_rec:.3f} ms")


if __name__ == "__main__":
    main()

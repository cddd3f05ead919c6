"""Benchmark: encode+decode MB/s/chip on the default platform (real TPU).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): reference CID22 single-thread FTL averages
397.76 MB/s encode and 354.57 MB/s decode on a Zen3 4.5 GHz core; the
combined (harmonic) encode+decode rate is 187.5 MB/s.  `vs_baseline` is
our combined rate divided by that.
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


def timeit(fn, iters=10):
    fn()  # warmup (compile)
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    import qb3_tpu

    img = natural_image(512, 512, 3)
    raw_mb = img.nbytes / 1e6

    stream = qb3_tpu.encode(img, mode=qb3_tpu.Mode.FTL)
    dec, _ = qb3_tpu.decode(stream)
    assert (dec == img).all(), "roundtrip failed"

    # conformance vs reference oracle when available
    sys.path.insert(0, "tests")
    try:
        import refqb3
        if refqb3.available():
            assert stream == refqb3.ref_encode(img, mode=8), "not bit-exact vs reference"
    except ImportError:
        pass

    t_enc = timeit(lambda: qb3_tpu.encode(img, mode=qb3_tpu.Mode.FTL))
    t_dec = timeit(lambda: qb3_tpu.decode(stream))
    enc_rate = raw_mb / t_enc
    dec_rate = raw_mb / t_dec
    combined = raw_mb / (t_enc + t_dec)
    print(f"# encode {enc_rate:.1f} MB/s, decode {dec_rate:.1f} MB/s, "
          f"ratio {100*len(stream)/img.nbytes:.1f}%", file=sys.stderr)
    print(json.dumps({
        "metric": "qb3 ftl encode+decode, 512x512x3 uint8, bit-exact",
        "value": round(combined, 2),
        "unit": "MB/s/chip",
        "vs_baseline": round(combined / BASELINE_COMBINED, 3),
    }))


if __name__ == "__main__":
    main()

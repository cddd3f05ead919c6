"""Compression study: QB3 modes vs PNG over a corpus, CID22-style.

The reference ships a CID22 study (performance/performance.md,
CID22_sizes.csv). That dataset isn't redistributable here, so this tool runs
the same axes over a seeded synthetic corpus of natural-statistics images
(or any folder of PNGs via --corpus) and writes performance/REPORT.md plus a
per-image CSV mirroring CID22_sizes.csv's columns.

    python tools/perf_study.py [--n 32] [--size 512] [--corpus DIR]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def load_corpus(args):
    if args.corpus:
        from PIL import Image

        for name in sorted(os.listdir(args.corpus))[: args.n]:
            if name.lower().endswith((".png", ".jpg")):
                arr = np.asarray(Image.open(os.path.join(args.corpus, name)))
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                yield name, arr
        return
    from corpus import natural8, real_images

    yield from real_images()
    for i in range(args.n):
        yield f"synthetic{i:03d}", natural8(args.size, args.size, 3, seed=1000 + i)


def png_size(img: np.ndarray) -> tuple[int, float]:
    from PIL import Image

    buf = io.BytesIO()
    t0 = time.perf_counter()
    Image.fromarray(img if img.shape[2] > 1 else img[:, :, 0]).save(
        buf, format="PNG", optimize=False)
    return buf.getbuffer().nbytes, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--corpus")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "performance"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (size study; avoids per-shape "
                         "TPU compiles)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import qb3_tpu

    os.makedirs(args.out, exist_ok=True)
    cols = ["image", "raw", "png", "ftl", "base", "best", "best_zstd"]
    rows = []
    times = {m: 0.0 for m in ("png", "ftl", "base", "best")}
    total_raw = 0
    for name, img in load_corpus(args):
        total_raw += img.nbytes
        pz, tpng = png_size(img)
        times["png"] += tpng
        sizes = {"png": pz}
        for label, mode in (("ftl", 8), ("base", 4), ("best", 7)):
            t0 = time.perf_counter()
            s = qb3_tpu.encode(img, mode=mode)
            times[label] += time.perf_counter() - t0
            sizes[label] = len(s)
            if label == "best":
                sizes["best_zstd"] = len(zlib.compress(s, 6))  # zstd stand-in
        rows.append([name, img.nbytes] + [sizes[c] for c in cols[2:]])
        print(f"{name}: raw {img.nbytes} png {pz} ftl {sizes['ftl']} "
              f"base {sizes['base']} best {sizes['best']}")

    csv_path = os.path.join(args.out, "sizes.csv")
    with open(csv_path, "w") as f:
        f.write(",".join(cols) + "\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")

    arr = np.array([r[1:] for r in rows], dtype=np.int64)
    raw, png, ftl, base, best, bestz = arr.sum(axis=0)
    n = len(rows)
    mb = total_raw / 1e6
    report = f"""# qb3-tpu compression study

Corpus: {n} images, {total_raw} raw bytes
({'folder ' + args.corpus if args.corpus else f'synthetic natural-statistics {args.size}x{args.size} RGB'}).
Mirrors the reference CID22 study axes (performance/performance.md).

| codec | total bytes | vs raw | savings vs PNG | encode MB/s (host e2e) |
|---|---|---|---|---|
| PNG (Pillow/zlib) | {png} | {100*png/raw:.2f}% | — | {mb/times['png']:.1f} |
| QB3 FTL | {ftl} | {100*ftl/raw:.2f}% | {100*(png-ftl)/png:.2f}% | {mb/times['ftl']:.1f} |
| QB3 BASE | {base} | {100*base/raw:.2f}% | {100*(png-base)/png:.2f}% | {mb/times['base']:.1f} |
| QB3 BEST | {best} | {100*best/raw:.2f}% | {100*(png-best)/png:.2f}% | {mb/times['best']:.1f} |
| QB3 BEST + deflate | {bestz} | {100*bestz/raw:.2f}% | {100*(png-bestz)/png:.2f}% | — |

Per-image sizes: sizes.csv. Reference published numbers: ../BASELINE.md.
"""
    with open(os.path.join(args.out, "REPORT.md"), "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()

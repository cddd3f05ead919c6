"""Generate web/sample_landsat8.qb3: a 512x512 8-band uint16 Landsat-style
synthetic tile (the reference demo's data shape, docs/index.html:96-99)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import qb3_tpu

    rng = np.random.default_rng(42)
    h = w = 512
    y, x = np.mgrid[0:h, 0:w]
    bands = []
    # terrain-ish base + band-dependent spectral response
    base = (3000 + 1500 * np.sin(x / 83.0) * np.cos(y / 57.0)
            + 900 * np.sin((x + y) / 131.0))
    ridge = 700 * np.abs(np.sin(x / 29.0 + np.cos(y / 41.0)))
    noise = rng.normal(0, 25, size=(h, w))
    noise = (noise + np.roll(noise, 1, 0) + np.roll(noise, 1, 1)) / 3
    for b in range(8):
        resp = 0.6 + 0.4 * np.sin(b * 0.9 + x / 211.0)
        band = base * resp + ridge * (0.3 + 0.1 * b) + noise * (1 + b / 4)
        bands.append(np.clip(band, 0, 65535))
    img = np.stack(bands, axis=-1).astype(np.uint16)
    stream = qb3_tpu.encode(img, mode=qb3_tpu.Mode.CF_H)
    out = os.path.join("web", "sample_landsat8.qb3")
    with open(out, "wb") as f:
        f.write(stream)
    print(f"{out}: {img.nbytes} -> {len(stream)} bytes "
          f"({100 * len(stream) / img.nbytes:.1f}%)")


if __name__ == "__main__":
    main()

"""Generate a z/y/x QB3 tile pyramid for the web viewer (web/map.html).

Counterpart of the reference's Leaflet tile source (docs/index.html:96-132,
which streams 512x512 QB3 tiles from an ArcGIS endpoint): this builds a
local pyramid from a synthetic scene so the slippy map works offline.

    python tools/gen_web_pyramid.py [scene_px] [out_dir]

Level zmax holds the scene at native resolution (scene_px / 512 tiles per
side, so scene_px must be 512 * 2^zmax); each lower level is a 2x2 box-mean
downsample.  Tiles are encoded in one batched dispatch per level
(qb3_tpu.batch.encode_tiles) and written as {out}/{z}/{y}/{x}.qb3 plus a
tiles.json manifest.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TILE = 512


def scene(px: int) -> np.ndarray:
    """Synthetic RGB scene with multiscale structure (ridges, basins,
    speckle) so every zoom level shows detail."""
    y, x = np.mgrid[0:px, 0:px].astype(np.float64) / px
    rng = np.random.default_rng(7)
    elev = (np.sin(x * 19) * np.cos(y * 23)
            + 0.5 * np.sin(x * 53 + 2 * np.sin(y * 11))
            + 0.25 * np.cos(x * 131 + y * 97)
            + 0.12 * np.sin(x * 389) * np.sin(y * 401))
    noise = rng.normal(0, 0.05, (px, px))
    noise = (noise + np.roll(noise, 1, 0) + np.roll(noise, 1, 1)) / 3
    elev = elev + noise
    r = np.clip(128 + 90 * elev, 0, 255)
    g = np.clip(128 + 90 * np.roll(elev, px // 7, axis=0), 0, 255)
    b = np.clip(128 - 70 * elev + 40 * np.sin(x * 7), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def main():
    px = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(__file__), "..", "web", "tiles")
    zmax = (px // TILE).bit_length() - 1
    assert TILE << zmax == px, "scene_px must be 512 * 2^z"

    import qb3_tpu
    from qb3_tpu.batch import encode_tiles

    level = scene(px)
    total = 0
    for z in range(zmax, -1, -1):
        n = level.shape[0] // TILE
        tiles = (level.reshape(n, TILE, n, TILE, 3)
                 .transpose(0, 2, 1, 3, 4).reshape(n * n, TILE, TILE, 3))
        streams = encode_tiles(np.ascontiguousarray(tiles),
                               mode=qb3_tpu.Mode.FTL)
        for i, s in enumerate(streams):
            yy, xx = divmod(i, n)
            d = os.path.join(out, str(z), str(yy))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{xx}.qb3"), "wb") as f:
                f.write(s)
            total += len(s)
        print(f"z={z}: {n}x{n} tiles")
        # 2x2 box mean for the next level
        level = (level.reshape(level.shape[0] // 2, 2,
                               level.shape[1] // 2, 2, 3)
                 .mean(axis=(1, 3)).astype(np.uint8))
    with open(os.path.join(out, "tiles.json"), "w") as f:
        json.dump({"tileSize": TILE, "zmin": 0, "zmax": zmax,
                   "dtype": "uint8", "nbands": 3}, f)
    print(f"pyramid at {out}: z 0..{zmax}, {total/1e6:.1f} MB")


if __name__ == "__main__":
    main()

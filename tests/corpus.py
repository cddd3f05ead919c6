"""Synthetic test rasters.

The reference validates every dtype/rung/common-factor combination by deriving
wider-typed images from a single 8-bit seed image via multiplication
(test_qb3.cpp:43-50, :675-685).  We reproduce that strategy with seeded
synthetic imagery: smooth gradients plus structured noise approximate the
statistics of natural photos (low-rung deltas with occasional spikes).
"""

from __future__ import annotations

import numpy as np


def natural8(h: int = 64, w: int = 64, bands: int = 1, seed: int = 0) -> np.ndarray:
    """A smooth-ish 8-bit image: gradients + blurred noise + edges."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    out = np.zeros((h, w, bands), dtype=np.uint8)
    for c in range(bands):
        base = 96 + 64 * np.sin(x / (9.0 + 3 * c)) + 48 * np.cos(y / (13.0 + 2 * c))
        noise = rng.normal(0, 6, size=(h, w))
        # crude blur to get spatial correlation
        noise = (noise + np.roll(noise, 1, 0) + np.roll(noise, 1, 1)) / 3
        img = base + noise
        # a few hard edges to exercise rung jumps
        img[(x + y * 2) % 37 < 2] += 90
        out[:, :, c] = np.clip(img, 0, 255).astype(np.uint8)
    return out


def to_type(img8: np.ndarray, dtype, mult: int = 1) -> np.ndarray:
    """Widen an 8-bit image by multiplication (the reference's `to<T>()` trick)."""
    return (img8.astype(dtype) * np.array(mult, dtype=dtype)).astype(dtype)


def photo8(h: int, w: int, seed: int = 0) -> np.ndarray:
    """An RGB image with natural-photo statistics: 1/f^alpha amplitude
    spectrum with random phase, correlated channels, a tone curve, and
    sensor-like grain.  Used for CID22-scale studies where the synthetic
    corpus must compress like real photographs."""
    rng = np.random.default_rng(seed)
    alpha = rng.uniform(1.0, 1.6)
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    f = np.hypot(fy, fx)
    f[0, 0] = 1.0
    amp = 1.0 / f ** alpha

    def field():
        phase = rng.uniform(0, 2 * np.pi, amp.shape)
        x = np.fft.irfft2(amp * np.exp(1j * phase), s=(h, w))
        return (x - x.mean()) / (x.std() + 1e-9)

    luma = field()
    chroma_w = rng.uniform(0.1, 0.35)
    chans = []
    for c in range(3):
        ch = luma + chroma_w * field()
        ch = (ch - ch.min()) / (np.ptp(ch) + 1e-9)
        ch = ch ** rng.uniform(0.7, 1.3)  # tone curve
        chans.append(ch)
    img = np.stack(chans, axis=-1) * 255
    img += rng.normal(0, rng.uniform(0.5, 3.0), size=img.shape)  # grain
    return np.clip(img, 0, 255).astype(np.uint8)


REAL_ASSETS = [
    # real-content images that happen to ship with installed packages
    "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/sample_data/grace_hopper.jpg",
    "/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/skin.png",
    "/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/wood1.png",
]
REAL_DEM = ("/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/"
            "sample_data/jacksboro_fault_dem.npz")


def real_images(max_side: int = 1024):
    """Yield (name, array) for real photos found on this system, if any."""
    import os

    try:
        from PIL import Image
    except ImportError:
        return
    for p in REAL_ASSETS:
        if os.path.exists(p):
            arr = np.asarray(Image.open(p).convert("RGB"))[:max_side, :max_side]
            yield os.path.basename(p), arr


def real_dem():
    """A real 16-bit elevation raster (BASELINE config 3), or None."""
    import os

    if not os.path.exists(REAL_DEM):
        return None
    z = np.load(REAL_DEM)["elevation"].astype(np.uint16)[:, :, None]
    return z


def random_noise(h: int, w: int, bands: int, dtype, seed: int = 1) -> np.ndarray:
    """Full-range incompressible noise (exercises stored fallback / high rungs)."""
    rng = np.random.default_rng(seed)
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max, size=(h, w, bands), endpoint=True, dtype=dtype)

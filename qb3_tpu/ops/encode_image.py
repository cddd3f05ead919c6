"""Image-layout phase A for the fast encoder (wide types).

encode.gather_blocks' (H/B, B, W/B, B) transpose is the dominant wide-type
encode cost (~3 ms of 7 on the 1024x1024 u64 tile: XLA's 16-lane relayout
of 8-byte elements runs far below HBM bandwidth).  This module removes it:
every phase-A quantity is computed directly in (H, W, C) image layout with
elementwise ops and 4x4 window reductions, and the only true relayout —
mag-sign values into (group, lane) order — happens inside the fused pack
kernel's VMEM via a one-hot MXU matmul (ops/encode_pallas.py).

Key identities (reference: QB3encode.h:376-451):
  * the scan-order delta of value i is a fixed spatial shift that depends
    only on the pixel's position class within its 4x4 block — both scan
    curves take unit or near-unit steps, so 4 shifted images cover every
    in-block predecessor, plus one fixup lane for the block-row wrap;
  * the per-block rung is a 4x4 window OR;
  * the step detector (QB3common.h:141-166) is per-pixel
    `rung_bit == (curve_index < ones)` AND-reduced over the block, with
    `ones` a 4x4 window sum — no scan-order traversal needed.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import B, B2, curve_offsets, ubits_for
from .bitutils import mags, topbit
from .encode import csw_arith


def _lane_tables(order: int):
    offs = curve_offsets(order)
    lane_of = np.zeros((B, B), dtype=np.int32)
    for i, (dy, dx) in enumerate(offs):
        lane_of[dy, dx] = i
    return offs, lane_of


def decorrelate(img, cband: tuple[int, ...]):
    """Band decorrelation in image layout (QB3encode.h:423-430)."""
    nb = img.shape[2]
    cb = np.asarray(cband, dtype=np.int32)
    core = img[:, :, cb]
    keep = jnp.asarray((cb == np.arange(nb)).astype(img.dtype))[None, None, :]
    return img - core * (1 - keep)


def delta_image(v, entry_prev, order: int):
    """Scan-order running delta, computed without leaving image layout.

    v: (H, W, C) band-decorrelated unsigned values; entry_prev: (C,).
    Returns (delta, exit_prev).
    """
    h, w, nb = v.shape
    offs, lane_of = _lane_tables(order)
    dy0, dx0 = offs[0]
    dy15, dx15 = offs[B2 - 1]

    # predecessor offset per position class; lane 0 uses the left block
    pred = {}
    for i in range(1, B2):
        d = (offs[i - 1][0] - offs[i][0], offs[i - 1][1] - offs[i][1])
        pred.setdefault(d, []).append(offs[i])
    pred.setdefault((dy15 - dy0, dx15 - dx0 - B), []).append(offs[0])

    yy = np.arange(h)[:, None] % B
    xx = np.arange(w)[None, :] % B
    shifted = jnp.zeros_like(v)
    for (ddy, ddx), pixels in pred.items():
        sh = jnp.roll(v, (-ddy, -ddx), axis=(0, 1))
        mask = np.zeros((B, B), dtype=bool)
        for (py, px) in pixels:
            mask[py, px] = True
        shifted = jnp.where(jnp.asarray(mask[yy, xx])[:, :, None],
                            sh, shifted)
    d = v - shifted

    # block-row wrap: the scan predecessor of block (by, 0)'s first value is
    # block (by-1, nbx-1)'s last value (entry_prev for by == 0)
    wrap_prev = v[dy15::B, w - B + dx15, :]  # (nby, C)
    wrap_prev = jnp.concatenate(
        [entry_prev[None, :].astype(v.dtype), wrap_prev[:-1]], axis=0)
    fix = np.zeros((h, w), dtype=bool)
    fix[dy0::B, dx0] = True
    wp = jnp.repeat(wrap_prev, B, axis=0)[:, None, :]  # (H, 1, C)
    d = jnp.where(jnp.asarray(fix)[:, :, None], v - wp, d)
    exit_prev = v[h - B + dy15, w - B + dx15, :]
    return d, exit_prev


def _block_max(x, h, w, nb):
    """4x4 window max.  Stands in for the reference's bitsused OR wherever
    only topbit/<=1/==1 are consumed: topbit(OR) == topbit(max) (the OR is
    in [max, 2*max)), and rung-0 groups hold only 0/1 values, so the
    bu == 1 / bu & 1 tests reduce to max == 1.  (A lax.reduce with a
    bitwise monoid lowers to scalar code on TPU — measured ~10 ms/image.)
    """
    t = x.reshape(h // B, B, w // B, B, nb)
    if x.dtype == jnp.uint64:
        # 64-bit max via pair lanes (native 32-bit compares)
        lo = t.astype(jnp.uint32)
        hi = (t >> 32).astype(jnp.uint32)
        hmax = jnp.max(hi, axis=(1, 3))
        at_h = hi == hmax[:, None, :, None, :]
        lmax = jnp.max(jnp.where(at_h, lo, 0), axis=(1, 3))
        return lmax.astype(jnp.uint64) | (hmax.astype(jnp.uint64) << 32)
    return jnp.max(t, axis=(1, 3))


def _block_sum(x, h, w, nb):
    t = x.reshape(h // B, B, w // B, B, nb)
    return jnp.sum(t, axis=(1, 3))


def _block_and(x, h, w, nb):
    t = (x != 0).astype(jnp.int32).reshape(h // B, B, w // B, B, nb)
    return jnp.min(t, axis=(1, 3)) != 0


def rungs_image(m, entry_runbits):
    """Per-block bitsused/rung/oldrung from image-layout mags.

    m: (H, W, C); returns (bitsused, rung, oldrung (nblocks, C) and
    exit_runbits (C,)) — block index is raster order, matching the flat
    group order of encode.block_rungs.
    """
    h, w, nb = m.shape
    bu = _block_max(m, h, w, nb).reshape(-1, nb)
    rung = topbit(bu | jnp.ones_like(bu))
    oldrung = jnp.concatenate(
        [entry_runbits[None, :].astype(jnp.int32), rung[:-1]], axis=0)
    return bu, rung, oldrung, rung[-1]


def _bit_at(m, r_px):
    """Per-pixel bit r of m without emulated 64-bit variable shifts."""
    if jnp.iinfo(m.dtype).bits <= 32:
        return ((m.astype(jnp.uint32) >> r_px.astype(jnp.uint32)) & 1
                ).astype(jnp.int32)
    lo = m.astype(jnp.uint32)
    hi = (m >> 32).astype(jnp.uint32)
    r32 = r_px.astype(jnp.uint32)
    b = jnp.where(r_px < 32, lo >> (r32 & 31), hi >> ((r32 - 32) & 31))
    return (b & 1).astype(jnp.int32)


def _px(x, h, w):
    """Broadcast a per-block (nby, nbx, C) tensor to pixels (H, W, C)."""
    nby, nbx, nb = x.shape
    t = jnp.broadcast_to(x[:, None, :, None, :], (nby, B, nbx, B, nb))
    return t.reshape(h, w, nb)


def step_flip_image(m, rung, order: int):
    """Apply the encoder-side step flip in image layout (QB3encode.h:169-176).

    Flips the rung bit of the value at curve index ones-1 when the rung bits
    in scan order form 1*0* with ones > 0.
    """
    h, w, nb = m.shape
    _, lane_of = _lane_tables(order)
    ci = jnp.asarray(lane_of)[np.arange(h)[:, None] % B,
                              np.arange(w)[None, :] % B]  # (H, W)
    rung_px = _px(rung.reshape(h // B, w // B, nb), h, w)
    bit = _bit_at(m, rung_px)
    ones = _block_sum(bit, h, w, nb)  # (nby, nbx, C)
    ones_px = _px(ones, h, w)
    okpix = bit == (ci[:, :, None] < ones_px).astype(jnp.int32)
    match = _block_and(okpix, h, w, nb)
    match_px = _px(match, h, w)
    do = (match_px & (ones_px > 0) & (ci[:, :, None] == ones_px - 1)
          & (rung_px >= 1))
    if jnp.iinfo(m.dtype).bits <= 32:
        return m ^ (jnp.where(do, 1, 0).astype(m.dtype)
                    << rung_px.astype(m.dtype))
    # pair-lane xor of bit rung (emulated u64 variable shifts are slow)
    r32 = rung_px.astype(jnp.uint32)
    flip_lo = jnp.where(do & (rung_px < 32),
                        jnp.uint32(1) << (r32 & 31), 0).astype(jnp.uint64)
    flip_hi = jnp.where(do & (rung_px >= 32),
                        jnp.uint32(1) << ((r32 - 32) & 31), 0
                        ).astype(jnp.uint64)
    return m ^ (flip_lo | (flip_hi << 32))


def value_lens_image(m, rung, skipstep: bool):
    """Per-value FULL code lengths (incl. the u64 65th bit) in image layout.

    m: (H, W, C) mags (already step-flipped for BASE); rung (nblocks, C).
    Returns lens (H, W, C) int32.
    """
    h, w, nb = m.shape
    rung_px = _px(rung.reshape(h // B, w // B, nb), h, w)
    r = jnp.maximum(rung_px, 1)
    # v < 2^(r+1), so top = bit r and nxt = bit r-1 (pair-lane bit picks)
    top = _bit_at(m, r)
    nxt = _bit_at(m, r - 1)
    lens = r + top + (top | nxt)
    # rung-0 classes: single bit when bitsused == 1, nothing when 0
    bu = _block_max(m, h, w, nb)
    r0 = (rung.reshape(h // B, w // B, nb) == 0) & (bu <= 1)
    bit1 = bu == 1
    r0_px = _px(r0, h, w)
    bit1_px = _px(bit1, h, w)
    return jnp.where(r0_px, jnp.where(bit1_px, 1, 0), lens)


def prefix_symbols(bu, rung, oldrung, ubits: int):
    """Codeswitch [+ all-zero flag] per group, flat (nblocks, C)."""
    cs_code, cs_len = csw_arith(rung, oldrung, ubits)
    rung0 = bu <= 1
    flag = (bu & 1).astype(jnp.uint32)
    code = jnp.where(rung0, cs_code | (flag << cs_len.astype(jnp.uint32)),
                     cs_code)
    ln = jnp.where(rung0, cs_len + 1, cs_len)
    return code, ln


def phase_a_image(img, entry_prev, entry_runbits, order: int,
                  cband: tuple[int, ...], skipstep: bool):
    """Full image-layout phase A: returns everything the fused pack kernel
    and the container need.

    Returns dict with: m (H, W, C mags, step-flipped for BASE), rung,
    bitsused (nblocks, C), prefix code/len (nblocks, C), glen flat
    (nblocks*C,) int32, exit_prev, exit_runbits.
    """
    h, w, nb = img.shape
    ubits = ubits_for(img.dtype.itemsize)
    v = decorrelate(img, cband)
    d, exit_prev = delta_image(v, entry_prev, order)
    m = mags(d)
    bu, rung, oldrung, exit_runbits = rungs_image(m, entry_runbits)
    if not skipstep:
        m = step_flip_image(m, rung, order)
    pcode, plen = prefix_symbols(bu, rung, oldrung, ubits)
    vlens = value_lens_image(m, rung, skipstep)
    vsum = _block_sum(vlens, h, w, nb).reshape(-1, nb)
    glen = (plen + vsum).reshape(-1)
    return dict(m=m, rung=rung, bitsused=bu, prefix_code=pcode,
                prefix_len=plen, glen=glen, exit_prev=exit_prev,
                exit_runbits=exit_runbits)

"""Image-layout phase A for the fast encoder (wide types).

encode.gather_blocks' (H/B, B, W/B, B) transpose is the dominant wide-type
encode cost (~3 ms of 7 on the 1024x1024 u64 tile: XLA's 16-lane relayout
of 8-byte elements runs far below HBM bandwidth).  This module removes it:
every phase-A quantity is computed directly in (H, W, C) image layout with
elementwise ops and 4x4 window reductions, and the only true relayout —
mag-sign values into (group, lane) order — happens inside the fused pack
kernel's VMEM via a one-hot MXU matmul (ops/encode_pallas.py).

All 64-bit math runs on u32 PAIR PLANES (lo, hi): XLA:TPU emulates u64
elementwise ops (especially variable shifts and relayouts) far below
native u32 rate — the pair formulation was measured several times faster
on the u64 tile.

Key identities (reference: QB3encode.h:376-451):
  * the scan-order delta of value i is a fixed spatial shift that depends
    only on the pixel's position class within its 4x4 block — both scan
    curves take unit or near-unit steps, so 4 shifted images cover every
    in-block predecessor, plus one fixup lane for the block-row wrap;
  * the per-block rung is a 4x4 window max (topbit(OR) == topbit(max));
  * the step detector (QB3common.h:141-166) is per-pixel
    `rung_bit == (curve_index < ones)` AND-reduced over the block, with
    `ones` a 4x4 window sum — no scan-order traversal needed.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import B, B2, curve_offsets, ubits_for
from .bitutils import topbit
from .encode import csw_arith

srl = jax.lax.shift_right_logical


def _lane_tables(order: int):
    offs = curve_offsets(order)
    lane_of = np.zeros((B, B), dtype=np.int32)
    for i, (dy, dx) in enumerate(offs):
        lane_of[dy, dx] = i
    return offs, lane_of


def _to_planes(img):
    """(H, W, C) unsigned -> (lo, hi) u32 planes (hi None for <= 32 bits)."""
    if img.dtype.itemsize == 8:
        return img.astype(jnp.uint32), (img >> 32).astype(jnp.uint32)
    return img.astype(jnp.uint32), None


def _pair_sub(alo, ahi, blo, bhi):
    borrow = (alo < blo).astype(jnp.uint32)
    return alo - blo, ahi - bhi - borrow


def _px(x, h, w):
    """Broadcast a per-block (nby, nbx, C) tensor to pixels (H, W, C)."""
    nby, nbx, nb = x.shape
    t = jnp.broadcast_to(x[:, None, :, None, :], (nby, B, nbx, B, nb))
    return t.reshape(h, w, nb)


def _block_max_pair(lo, hi, h, w, nb):
    """4x4 window max of pair-plane values.  Stands in for the reference's
    bitsused OR wherever only topbit/<=1/==1 are consumed: topbit(OR) ==
    topbit(max), and rung-0 groups hold only 0/1 values."""
    tl = lo.reshape(h // B, B, w // B, B, nb)
    if hi is None:
        return jnp.max(tl, axis=(1, 3)), None
    th = hi.reshape(h // B, B, w // B, B, nb)
    hmax = jnp.max(th, axis=(1, 3))
    at_h = th == hmax[:, None, :, None, :]
    lmax = jnp.max(jnp.where(at_h, tl, 0), axis=(1, 3))
    return lmax, hmax


def _block_sum(x, h, w, nb):
    t = x.reshape(h // B, B, w // B, B, nb)
    return jnp.sum(t, axis=(1, 3))


def _block_all(x, h, w, nb):
    t = x.astype(jnp.int32).reshape(h // B, B, w // B, B, nb)
    return jnp.min(t, axis=(1, 3)) != 0


def _bit_at_pair(lo, hi, r_px):
    """Per-pixel bit r (native u32 variable shifts only)."""
    r32 = r_px.astype(jnp.uint32)
    if hi is None:
        return ((lo >> r32) & 1).astype(jnp.int32)
    b = jnp.where(r_px < 32, lo >> (r32 & 31), hi >> ((r32 - 32) & 31))
    return (b & 1).astype(jnp.int32)


def decorrelate_planes(img, cband: tuple[int, ...]):
    """Band decorrelation on pair planes (QB3encode.h:423-430)."""
    nb = img.shape[2]
    lo, hi = _to_planes(img)
    cb = np.asarray(cband, dtype=np.int32)
    sub = jnp.asarray((cb != np.arange(nb)))[None, None, :]
    clo = jnp.where(sub, lo[:, :, cb], 0)
    if hi is None:
        return lo - clo, None
    chi = jnp.where(sub, hi[:, :, cb], 0)
    return *_pair_sub(lo, hi, clo, chi),


def delta_planes(vlo, vhi, entry_prev, order: int):
    """Scan-order running delta on pair planes.

    Returns (dlo, dhi, exit_prev (C,) uint64)."""
    h, w, nb = vlo.shape
    offs, _ = _lane_tables(order)
    dy0, dx0 = offs[0]
    dy15, dx15 = offs[B2 - 1]

    pred = {}
    for i in range(1, B2):
        d = (offs[i - 1][0] - offs[i][0], offs[i - 1][1] - offs[i][1])
        pred.setdefault(d, []).append(offs[i])
    pred.setdefault((dy15 - dy0, dx15 - dx0 - B), []).append(offs[0])

    yy = np.arange(h)[:, None] % B
    xx = np.arange(w)[None, :] % B
    plo = jnp.zeros_like(vlo)
    phi = jnp.zeros_like(vlo) if vhi is not None else None
    for (ddy, ddx), pixels in pred.items():
        mask = np.zeros((B, B), dtype=bool)
        for (py, px) in pixels:
            mask[py, px] = True
        m = jnp.asarray(mask[yy, xx])[:, :, None]
        plo = jnp.where(m, jnp.roll(vlo, (-ddy, -ddx), axis=(0, 1)), plo)
        if vhi is not None:
            phi = jnp.where(m, jnp.roll(vhi, (-ddy, -ddx), axis=(0, 1)), phi)

    # block-row wrap: predecessor of block (by, 0)'s first value is block
    # (by-1, nbx-1)'s last (entry_prev for by == 0)
    fix = np.zeros((h, w), dtype=bool)
    fix[dy0::B, dx0] = True
    fixm = jnp.asarray(fix)[:, :, None]

    def wrap(plane, entry):
        wp = plane[dy15::B, w - B + dx15, :]  # (nby, C)
        wp = jnp.concatenate([entry[None, :].astype(jnp.uint32), wp[:-1]], 0)
        wpx = jnp.broadcast_to(wp[:, None, None, :],
                               (h // B, B, 1, nb)).reshape(h, 1, nb)
        return jnp.where(fixm, wpx, 0)

    e32 = entry_prev.astype(jnp.uint64)
    plo = jnp.where(fixm, 0, plo) + wrap(vlo, e32.astype(jnp.uint32))
    if vhi is not None:
        phi = jnp.where(fixm, 0, phi) + wrap(vhi, (e32 >> 32)
                                             .astype(jnp.uint32))
        dlo, dhi = _pair_sub(vlo, vhi, plo, phi)
        xlo = vlo[h - B + dy15, w - B + dx15, :].astype(jnp.uint64)
        xhi = vhi[h - B + dy15, w - B + dx15, :].astype(jnp.uint64)
        return dlo, dhi, xlo | (xhi << 32)
    dlo = vlo - plo
    return dlo, None, vlo[h - B + dy15, w - B + dx15, :].astype(jnp.uint64)


def mags_planes(dlo, dhi, tbits: int):
    """Two's complement -> mag-sign on pair planes (QB3common.h:127-130)."""
    if dhi is None:
        if tbits < 32:
            mask = jnp.uint32((1 << tbits) - 1)
            d = dlo & mask
            sign = (d >> (tbits - 1)) & 1
            return ((d << 1) ^ (jnp.uint32(0) - sign)) & mask, None
        sign = dlo >> 31
        return (dlo << 1) ^ (jnp.uint32(0) - sign), None
    sign = dhi >> 31
    neg = jnp.uint32(0) - sign
    mlo = (dlo << 1) ^ neg
    mhi = ((dhi << 1) | (dlo >> 31)) ^ neg
    return mlo, mhi


def step_flip_planes(mlo, mhi, rung, order: int):
    """Encoder-side step flip in image layout (QB3encode.h:169-176)."""
    h, w, nb = mlo.shape
    _, lane_of = _lane_tables(order)
    ci = jnp.asarray(lane_of)[np.arange(h)[:, None] % B,
                              np.arange(w)[None, :] % B]
    rung_px = _px(rung.reshape(h // B, w // B, nb), h, w)
    bit = _bit_at_pair(mlo, mhi, rung_px)
    ones = _block_sum(bit, h, w, nb)
    ones_px = _px(ones, h, w)
    okpix = bit == (ci[:, :, None] < ones_px).astype(jnp.int32)
    match_px = _px(_block_all(okpix, h, w, nb), h, w)
    do = (match_px & (ones_px > 0) & (ci[:, :, None] == ones_px - 1)
          & (rung_px >= 1))
    r32 = rung_px.astype(jnp.uint32)
    if mhi is None:
        return mlo ^ jnp.where(do, jnp.uint32(1) << (r32 & 31), 0), None
    flip_lo = jnp.where(do & (rung_px < 32), jnp.uint32(1) << (r32 & 31), 0)
    flip_hi = jnp.where(do & (rung_px >= 32),
                        jnp.uint32(1) << ((r32 - 32) & 31), 0)
    return mlo ^ flip_lo, mhi ^ flip_hi


def value_lens_planes(mlo, mhi, rung, bu_r0, bu_bit1):
    """Per-value FULL code lengths (incl. the u64 65th bit), image layout."""
    h, w, nb = mlo.shape
    rung_px = _px(rung.reshape(h // B, w // B, nb), h, w)
    r = jnp.maximum(rung_px, 1)
    # v < 2^(r+1): top = bit r, nxt = bit r-1
    top = _bit_at_pair(mlo, mhi, r)
    nxt = _bit_at_pair(mlo, mhi, r - 1)
    lens = r + top + (top | nxt)
    return jnp.where(_px(bu_r0, h, w), jnp.where(_px(bu_bit1, h, w), 1, 0),
                     lens)


def prefix_symbols(bu_le1, bu_eq1, rung, oldrung, ubits: int):
    """Codeswitch [+ all-zero flag] per group, flat (nblocks, C)."""
    cs_code, cs_len = csw_arith(rung, oldrung, ubits)
    flag = bu_eq1.astype(jnp.uint32)
    code = jnp.where(bu_le1, cs_code | (flag << cs_len.astype(jnp.uint32)),
                     cs_code)
    ln = jnp.where(bu_le1, cs_len + 1, cs_len)
    return code, ln


def phase_a_image(img, entry_prev, entry_runbits, order: int,
                  cband: tuple[int, ...], skipstep: bool):
    """Full image-layout phase A on u32 pair planes.

    Returns dict with: m_lo/m_hi (H, W, C) u32 mag-sign planes (m_hi None
    for <= 32-bit types; step-flipped for BASE), rung (nblocks, C), gkind
    (0 normal / 1 bits / 2 zero), prefix code/len, glen flat, exit_prev,
    exit_runbits.
    """
    h, w, nb = img.shape
    tbits = img.dtype.itemsize * 8
    ubits = ubits_for(img.dtype.itemsize)
    vlo, vhi = decorrelate_planes(img, cband)
    dlo, dhi, exit_prev = delta_planes(vlo, vhi, entry_prev, order)
    mlo, mhi = mags_planes(dlo, dhi, tbits)
    blo, bhi = _block_max_pair(mlo, mhi, h, w, nb)
    # rung via pair topbit
    if bhi is None:
        rung3 = topbit(blo | jnp.uint32(1))
        bu_le1 = blo <= 1
        bu_eq1 = blo == 1
    else:
        rung3 = jnp.where(bhi != 0, topbit(bhi | jnp.uint32(1)) + 32,
                          topbit(blo | jnp.uint32(1)))
        bu_le1 = (bhi == 0) & (blo <= 1)
        bu_eq1 = (bhi == 0) & (blo == 1)
    rung = rung3.reshape(-1, nb)
    bu_le1f = bu_le1.reshape(-1, nb)
    bu_eq1f = bu_eq1.reshape(-1, nb)
    oldrung = jnp.concatenate(
        [entry_runbits[None, :].astype(jnp.int32), rung[:-1]], axis=0)
    if not skipstep:
        mlo, mhi = step_flip_planes(mlo, mhi, rung, order)
    pcode, plen = prefix_symbols(bu_le1f, bu_eq1f, rung, oldrung, ubits)
    vlens = value_lens_planes(mlo, mhi, rung, bu_le1, bu_eq1)
    glen = (plen + _block_sum(vlens, h, w, nb).reshape(-1, nb)).reshape(-1)
    gkind = jnp.where(~bu_le1f, 0, jnp.where(bu_eq1f, 1, 2)).reshape(-1)
    return dict(m_lo=mlo, m_hi=mhi, rung=rung, gkind=gkind,
                prefix_code=pcode, prefix_len=plen, glen=glen,
                exit_prev=exit_prev,
                exit_runbits=rung[-1])

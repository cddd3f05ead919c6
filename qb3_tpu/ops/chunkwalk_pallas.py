"""Pallas TPU kernel for the self-contained ("ic") chunk walk, 8-bit lanes.

The "ic" sidecar anchors the stream every K blocks (decode_chunked.py); the
intra-chunk walk is serial: K*nbands groups decode back-to-back, each group's
bit offset known only after the previous one.  The XLA formulation
(decode_chunked.decode_chunked) re-gathers an NREG register window from HBM
for every one of those K*nbands steps and round-trips every accumulator op
through HBM — that caps the honest sidecar-free decode around 145 MB/s.

This kernel runs the WHOLE walk in VMEM: each chunk's full word window
(MAXW u32 words, pre-gathered once by the MXU one-hot gather), a 64-bit
accumulator held as two 32-bit lanes, and the per-band runbits state all
stay on-chip for all K*nbands groups.  HBM traffic is one read of the
(MAXW, G) window block and one write of the (K*nbands*16, G) values.

Stream grammar per group mirrors QB3decode.h:603-723: codeswitch (dsw VLC on
ubits=3), rung-0 flag (BITS/ZERO classes), then 16 values as the 3-range
group-context VLC at the running rung; BASE modes restore the step bit
(QB3decode.h:285-289).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bitutils import words_u32
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import B2
from .wavefront_pallas import _vlc32, _vlc32w

srl = jax.lax.shift_right_logical


def _chunkwalk8_kernel(MAXW: int, K: int, NB: int, G8: int, apply_step: bool,
                       ubits: int = 3):
    """One grid step walks G8*128 chunks through all K*NB groups.

    ubits selects the lane width: 3 = u8 (codes <= 9 bits, 3 values per
    <= 27-bit macro step), 4 = u16 (codes <= 17 bits, 1 value per step —
    still a 2-lane 64-bit accumulator, just a tighter refill threshold)."""
    n_groups = K * NB
    per = 3 if ubits == 3 else 1
    need_bits = 27 if ubits == 3 else 17
    nmask = (1 << ubits) - 1
    takes = np.minimum(per, B2 - np.arange(0, B2, per))

    def kernel(win_ref, phase_ref, rung0_ref, out_ref, rungs_ref):
        # per-band runbits state lives in scratch so the group loop can
        # index it by the (dynamic) band id
        for b in range(NB):
            rungs_ref[b] = rung0_ref[b]

        widx = jax.lax.broadcasted_iota(jnp.int32, (MAXW, G8, 128), 0)

        def fetch(k):
            """win[k] per lane: masked-OR over the VMEM-resident window."""
            m = widx == k[None]
            return jnp.sum(jnp.where(m, win_ref[...], 0), axis=0)

        def refill(alo, ahi, navail, k):
            """Top up the 64-bit accumulator to >= need_bits valid bits."""
            need = navail < need_bits
            fl = jnp.where(need, fetch(k), 0)
            sa = jnp.where(need, navail, 0)  # in [0, 26] when need
            alo = alo | (fl << sa)
            # sa == 0: the fill lands entirely in alo
            ahi = ahi | jnp.where(need & (sa != 0), srl(fl, (32 - sa) & 31), 0)
            navail = navail + jnp.where(need, 32, 0)
            k = k + jnp.where(need, 1, 0)
            return alo, ahi, navail, k

        def consume(alo, ahi, navail, nbits):
            """Drop nbits (< 32) low bits from the accumulator."""
            nz = nbits != 0
            alo = jnp.where(nz, srl(alo, nbits) | (ahi << ((32 - nbits) & 31)),
                            alo)
            ahi = srl(ahi, nbits)
            return alo, ahi, navail - nbits

        # accumulator init: bits [phase, phase+64) of the window
        ph = phase_ref[0]
        r0, r1, r2 = win_ref[0], win_ref[1], win_ref[2]
        nz = ph != 0
        ish = (32 - ph) & 31
        alo = jnp.where(nz, srl(r0, ph) | (r1 << ish), r0)
        ahi = jnp.where(nz, srl(r1, ph) | (r2 << ish), r1)
        navail = 64 - ph
        k = jnp.full_like(ph, 2)

        def group_step(i, carry):
            alo, ahi, navail, k = carry
            band = jax.lax.rem(i, NB)
            rung = rungs_ref[band]
            alo, ahi, navail, k = refill(alo, ahi, navail, k)

            # ---- codeswitch (QB3decode.h:613-618), arithmetic dsw
            r = ubits - 1
            rb = 1 << r
            vm = rb - 1
            w = alo
            has_cs = (w & 1) == 1
            w1 = srl(w, 1)
            short = (w1 & 1) == 0
            n = srl(w1, 1) & 1
            v = jnp.where(short, srl(w1 & vm, 1),
                          jnp.where(n == 0, (srl(w1, 2) & vm) | srl(rb, 1),
                                    (srl(w1, 2) & vm) | rb))
            dlen = jnp.where(short, r, r + 1 + n) + 1
            mag = srl(v, 1)
            neg = (v & 1) == 1
            ddelta = jnp.where(neg, (-(mag + 1)) & nmask,
                               (mag + 1) & (nmask >> 1))
            cs_len = jnp.where(has_cs, dlen, 1)
            delta = jnp.where(has_cs, ddelta, 0)
            rung = (rung + delta) & nmask
            rungs_ref[band] = rung
            rung0 = rung == 0
            flag = srl(w, cs_len) & 1
            isg = ~rung0
            isb = rung0 & (flag == 1)
            alo, ahi, navail = consume(
                alo, ahi, navail, cs_len + jnp.where(rung0, 1, 0))

            # ---- 16-value wavefront, 3 values (<= 27 bits) per macro step
            vals = []
            for take in takes:
                alo, ahi, navail, k = refill(alo, ahi, navail, k)
                shift = jnp.zeros_like(navail)
                for t in range(int(take)):
                    snz = shift != 0
                    ww = jnp.where(snz, srl(alo, shift)
                                   | (ahi << ((32 - shift) & 31)), alo)
                    gv, gl = (_vlc32 if ubits == 3 else _vlc32w)(ww, rung)
                    v = jnp.where(isg, gv, jnp.where(isb, ww & 1, 0))
                    ln = jnp.where(isg, gl, jnp.where(isb, 1, 0))
                    vals.append(v)
                    shift = shift + ln
                alo, ahi, navail = consume(alo, ahi, navail, shift)

            if apply_step:
                # step-bit restore (QB3decode.h:285-289): flip bit `rung` of
                # value #ones when the rung bits form the 1*0* pattern
                acc = jnp.zeros_like(rung)
                for i2, v in enumerate(vals):
                    acc = acc | ((srl(v, rung) & 1) << i2)
                match = (acc & (acc + 1)) == 0
                ones = jax.lax.population_count(acc)
                do = isg & match & (rung >= 1) & (ones < B2)
                vals = [jnp.where(do & (ones == i2), v ^ (1 << rung), v)
                        for i2, v in enumerate(vals)]

            out_ref[pl.ds(i * B2, B2)] = jnp.stack(vals, axis=0)
            return alo, ahi, navail, k

        jax.lax.fori_loop(0, n_groups, group_step, (alo, ahi, navail, k))

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "MAXW", "K", "NB", "apply_step", "G_BLK", "R", "interpret", "ubits"))
def chunkwalk8(words64, starts, entry_rungs, MAXW: int, K: int, NB: int,
               apply_step: bool, G_BLK: int = 1024, R: int | None = None,
               interpret: bool = False, ubits: int = 3):
    """Chunk-parallel u8/u16 walk -> (nchunks, K, NB, B2) uint32 mag-sign
    values (ubits 3 = u8 lanes, 4 = u16 lanes).

    words64: padded stream words; starts (nchunks,) i32 absolute bit offsets;
    entry_rungs (nchunks, NB) i32 runbits at each chunk entry.  MAXW covers
    the widest chunk span from any 32-bit phase (host: _ic_maxw); R the
    gather window (host: _ic_window_R).  Lanes pad to G_BLK; padded lanes
    decode garbage that callers discard.
    """
    nchunks = starts.shape[0]
    words32 = words_u32(words64)
    base = (starts >> 5).astype(jnp.int32)
    phase = (starts & 31).astype(jnp.int32)

    pad = (-nchunks) % G_BLK
    if pad:
        base = jnp.concatenate([base, jnp.broadcast_to(base[-1], (pad,))])
        phase = jnp.concatenate([phase, jnp.zeros(pad, jnp.int32)])
        entry_rungs = jnp.concatenate(
            [entry_rungs, jnp.zeros((pad, NB), entry_rungs.dtype)])
    nch_pad = nchunks + pad

    if interpret or jax.default_backend() != "tpu":
        win = words32[jnp.clip(base[:, None] + jnp.arange(MAXW)[None, :],
                               0, words32.shape[0] - 1)]
        # clipped tail indices would alias real words; walk offsets never
        # reach them for live chunks, and padded lanes are discarded
    else:
        from .gather import gather_slabs_onehot8
        win = gather_slabs_onehot8(words32, base, 128, MAXW, R)

    G8 = G_BLK // 128
    n_tiles = nch_pad // G_BLK
    winT = jax.lax.bitcast_convert_type(
        jnp.transpose(win), jnp.int32).reshape(MAXW, n_tiles * G8, 128)
    shape1 = (1, n_tiles * G8, 128)
    rungsT = jnp.transpose(entry_rungs.astype(jnp.int32)).reshape(
        NB, n_tiles * G8, 128)
    nrows = K * NB * B2
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _chunkwalk8_kernel(MAXW, K, NB, G8, apply_step, ubits),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((MAXW, G8, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G8, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, G8, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nrows, G8, 128), lambda t: (0, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nrows, n_tiles * G8, 128),
                                           jnp.int32),
            scratch_shapes=[pltpu.VMEM((NB, G8, 128), jnp.int32)],
            interpret=interpret,
        )(winT, phase.reshape(shape1), rungsT)
    out = jax.lax.bitcast_convert_type(out, jnp.uint32)
    # (K*NB*B2, nch_pad) -> (nchunks, K, NB, B2)
    return jnp.transpose(out.reshape(nrows, nch_pad))[:nchunks].reshape(
        nchunks, K, NB, B2)


def ic_maxw(spans: np.ndarray) -> int:
    """Static window word count covering the widest chunk from any 32-bit
    phase (host side), bucketed to limit recompiles."""
    m = int(spans.max()) if spans.size else 0
    w = m // 32 + 3
    return max(8, -(-w // 16) * 16)


def ic_window_R(starts: np.ndarray, maxw: int, G: int = 128) -> int:
    """Gather window word count for gather_slabs_onehot8 over chunk bases
    (host side): covers every G-chunk tile's span plus MAXW slack."""
    base = np.asarray(starts, np.int64) >> 5
    n = base.shape[0]
    pad = (-n) % G
    if pad:
        base = np.concatenate([base, np.repeat(base[-1], pad)])
    first = (base[::G] >> 7) << 7  # 128-aligned window starts
    last = base[np.minimum(np.arange(first.size) * G + G - 1, base.size - 1)]
    R = int((last - first).max()) + maxw + 130
    return max(256, -(-R // 256) * 256)

"""Fused window-build + wavefront decode kernel (all element widths).

Replaces gather_slabs_onehot8 + wavefront8/wavefront_wide on the indexed
decode path: the per-group register windows never touch HBM.  The XLA
formulation materializes the shifted window stack (~35 MB for a u64 tile),
the one-hot mask, and the (ngroups, NREG) register array in HBM — measured
3.6 ms of the 3.8 ms u64 wavefront (tools/profile_wide_dec.py).  Here, per
tile of G_BLK groups:

  1. one DMA pulls the tile's stream span from a planar (8, N/8) u32 view
     of the payload into VMEM (P[k, i] = words[8*i + k], so consecutive
     8-word chunks are lane-adjacent);
  2. per 128-group subtile, one bf16 one-hot matmul on the MXU builds all
     128 register windows at once: A (4 bytes x nch x 8 rows, R8sub) are
     byte planes of chunk-shifted window lanes, B (R8sub, 128) is the
     one-hot of each group's 8-word-aligned chunk offset; exactness holds
     because bf16 represents 0..255 and each f32 output sums exactly one
     selected byte;
  3. the 16-value VLC walk (same body as wavefront_pallas) runs on the
     in-VMEM windows.

Group windows are 8-word aligned (base8 = bit_offset >> 8), so the walk's
value-start offset carries the 0..255-bit chunk phase on top of the
codeswitch length; the register select chains are sized by NREGW =
nch * 8 words covering worst phase + the stream's actual max group span.

Stream grammar per QB3decode.h:603-723 (values only; the codeswitch is
parsed by the caller, which feeds rung/kind/off per group).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import B2
from .wavefront_pallas import _vlc32, _vlc32w, _vlc64

srl = jax.lax.shift_right_logical


def _window_build(pwin_ref, a_ref, creg_ref, rel8_ref, nch: int, G8: int,
                  R8: int, R8sub: int, NREGW: int):
    """Fill creg_ref (NREGW, G8, 128) with each group's register window.

    pwin_ref: (8, R8P) planar stream span; rel8_ref: (1, G8, 128) chunk
    offsets relative to the tile window start; a_ref: (4*nch*8, R8)
    bf16 scratch.
    """
    pw = pwin_ref[...]  # (8, R8P) int32
    r8p = pw.shape[1]
    for c in range(nch):
        pwc = pltpu.roll(pw, r8p - c, 1)[:, :R8] if c else pw[:, :R8]
        for bb in range(4):
            pb = (srl(pwc, 8 * bb) & 255).astype(jnp.bfloat16)
            a_ref[(bb * nch + c) * 8:(bb * nch + c + 1) * 8, :] = pb

    for s in range(G8):
        rel_row = rel8_ref[0, s, :].reshape(1, 128)
        sb = jnp.minimum(jnp.maximum((rel8_ref[0, s, 0] >> 7) << 7, 0),
                         R8 - R8sub)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (R8sub, 128), 0)
                  == (rel_row - sb)).astype(jnp.bfloat16)
        asub = a_ref[:, pl.ds(pl.multiple_of(sb, 128), R8sub)]
        m = jax.lax.dot_general(asub, onehot, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # recombine byte planes; rows (bb*nch + c)*8 + k map to word c*8+k
        acc = m[0:nch * 8].astype(jnp.int32)
        for bb in range(1, 4):
            acc = acc + (m[bb * nch * 8:(bb + 1) * nch * 8].astype(jnp.int32)
                         << (8 * bb))
        creg_ref[:, s, :] = acc[:NREGW]


def _seg_prefix(x, nb: int, G8: int):
    """In-kernel band-segmented prefix sum over the flat (G8, 128) group
    order (flat g = sublane*128 + lane): x[g] += x[g - nb*2^k] for all k.

    Any nb <= 16: a shift by d = m*128 + r is a lane roll by r plus a
    sublane roll by m (lanes < r borrow one extra sublane)."""
    total = G8 * 128
    d = nb
    lane = jax.lax.broadcasted_iota(jnp.int32, (G8, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (G8, 128), 0)
    while d < total:
        r = d % 128
        m = d // 128
        if m == 0:
            a = pltpu.roll(x, r, 1)
            b = pltpu.roll(a, 1, 0)
            sh = jnp.where(lane >= r, a, jnp.where(sub == 0, 0, b))
        elif r == 0:
            sh = jnp.where(sub >= m, pltpu.roll(x, m, 0), 0)
        else:
            a = pltpu.roll(x, r, 1)
            am = pltpu.roll(a, m, 0)
            am1 = pltpu.roll(a, m + 1, 0)
            sh = jnp.where(lane >= r, jnp.where(sub >= m, am, 0),
                           jnp.where(sub >= m + 1, am1, 0))
        x = x + sh
        d *= 2
    return x


def _dsw_arith32(w1, ubits: int):
    """decode.dsw_arith on i32 lanes (codeswitch fields are < 12 bits)."""
    r = ubits - 1
    rbit = jnp.int32(1 << r)
    short = (w1 & 1) == 0
    n = srl(w1, 1) & 1
    vmask = rbit - 1
    v = jnp.where(short, srl(w1 & vmask, 1),
                  jnp.where(n == 0, (srl(w1, 2) & vmask) | srl(rbit, 1),
                            (srl(w1, 2) & vmask) | rbit))
    ln = jnp.where(short, r, r + 1 + n) + 1
    mag = srl(v, 1)
    neg = (v & 1) == 1
    nmask = (1 << ubits) - 1
    delta = jnp.where(neg, (-(mag + 1)) & nmask,
                      (mag + 1) & ((1 << (ubits - 1)) - 1))
    return ln, delta


def _fused_kernel(NREGW: int, nch: int, G8: int, R8: int, R8P: int,
                  R8sub: int, tbits: int, nbands: int | None,
                  steps_per_tile: int = 0):
    nrP = R8P // 128
    ubits = {8: 3, 16: 4, 32: 5, 64: 6}[tbits]
    nmask = (1 << ubits) - 1

    def kernel(w8_ref, planar_ref, rel8_ref, off_ref, rung_ref, kind_ref,
               out_ref, pwin_ref, pw_ref, a_ref, creg_ref, carry_ref,
               rungv_ref, sems):
        t = pl.program_id(0)
        slot = jax.lax.rem(t, 2)

        def dma(ti, sl):
            return pltpu.make_async_copy(
                planar_ref.at[:, pl.ds(w8_ref[ti], nrP), :],
                pwin_ref.at[sl], sems.at[sl])

        # double buffer: tile t's window was started at step t-1; kick off
        # t+1's copy before waiting so the DMA overlaps this tile's compute
        @pl.when(t == 0)
        def _():
            dma(0, slot).start()

        @pl.when(t + 1 < pl.num_programs(0))
        def _():
            dma(t + 1, 1 - slot).start()

        dma(t, slot).wait()
        # chunk-rows -> chunk-lanes per plane (sublane-to-lane flatten)
        for k in range(8):
            pw_ref[k:k + 1, :] = pwin_ref[slot, k].reshape(1, R8P)
        _window_build(pw_ref, a_ref, creg_ref, rel8_ref, nch, G8,
                      R8, R8sub, NREGW)

        regs = [creg_ref[j] for j in range(NREGW)]
        zero = jnp.zeros_like(regs[0])
        regs = regs + [zero, zero, zero]

        if nbands is None:
            off0 = off_ref[0]
            rung = rung_ref[0]
            kind = kind_ref[0]
        else:
            # in-kernel codeswitch parse + band-segmented rung chain
            # (QB3decode.h:603-618; the cumsum carries across grid tiles)
            ph = off_ref[0]  # bit phase of the group start within its window
            wi = srl(ph, 5)  # 0..7 (the window base is 8-word aligned)
            sh = ph & 31
            w0lo, w0hi = regs[7], regs[8]
            for i in range(6, -1, -1):
                w0lo = jnp.where(wi == i, regs[i], w0lo)
                w0hi = jnp.where(wi == i, regs[i + 1], w0hi)
            nz = sh != 0
            w0 = jnp.where(nz, srl(w0lo, sh) | (w0hi << ((32 - sh) & 31)),
                           w0lo)
            has_cs = (w0 & 1) == 1
            dlen, ddelta = _dsw_arith32(srl(w0, 1), ubits)
            cs_len = jnp.where(has_cs, dlen, 1)
            delta = jnp.where(has_cs, ddelta, 0)
            if nbands & (nbands - 1):
                # non-power-of-two band count: G_BLK % nbands == 0 (caller
                # guarantees), so each grid step starts at band 0 and the
                # lane->band map is (sub*128 + lane) mod nbands — computed
                # from iotas (Pallas kernels cannot capture array consts)
                sub_io = jax.lax.broadcasted_iota(jnp.int32, (G8, 128), 0)
                lane_io = jax.lax.broadcasted_iota(jnp.int32, (G8, 128), 1)
                band = jax.lax.rem(sub_io * 128 + lane_io,
                                   jnp.int32(nbands))
            else:
                lane_io = jax.lax.broadcasted_iota(jnp.int32, (G8, 128), 1)
                band = lane_io & (nbands - 1)
            carry = jnp.zeros((G8, 128), jnp.int32)
            for b in range(nbands):
                carry = carry + jnp.where(band == b, carry_ref[0, b], 0)

            # rung chain resets at stream starts: step 0 (single stream)
            # or every tile boundary (flat batch of independent streams)
            is_start = (t == 0 if steps_per_tile == 0
                        else jax.lax.rem(t, steps_per_tile) == 0)

            @pl.when(is_start)
            def _():
                for b in range(nbands):
                    carry_ref[0, b] = 0

            carry = jnp.where(is_start, 0, carry)
            rung = (_seg_prefix(delta, nbands, G8) + carry) & nmask
            rungv_ref[...] = rung
            for b in range(nbands):
                carry_ref[0, b] = rungv_ref[G8 - 1, 128 - nbands + b]
            rung0 = rung == 0
            flag = srl(w0, cs_len) & 1
            kind = jnp.where(rung0, jnp.where(flag == 1, 2, 0), 1)
            off0 = ph + cs_len + jnp.where(rung0, 1, 0)
            # export the recovered rung chain (callers need it for the
            # BASE-mode step restore)
            out_ref[B2 if tbits <= 16 else 2 * B2] = rung

        isg = kind == 1
        isb = kind == 2

        def selreg(k):
            out = regs[NREGW + 2]
            for i in range(NREGW + 1, -1, -1):
                out = jnp.where(k == i, regs[i], out)
            return out

        if tbits == 8:
            # accumulator walk (wavefront_pallas._wavefront8_kernel)
            PER = 3
            takes = np.minimum(PER, B2 - np.arange(0, B2, PER))
            sh = off0 & 31
            k0 = srl(off0, 5)
            r0, r1, r2 = selreg(k0), selreg(k0 + 1), selreg(k0 + 2)
            nz = sh != 0
            ish = (32 - sh) & 31
            alo = jnp.where(nz, srl(r0, sh) | (r1 << ish), r0)
            ahi = jnp.where(nz, srl(r1, sh) | (r2 << ish), r1)
            navail = 64 - sh
            k = k0 + 2
            vi = 0
            for take in takes:
                shift = jnp.zeros_like(off0)
                for t_ in range(int(take)):
                    snz = shift != 0
                    ww = jnp.where(snz, srl(alo, shift)
                                   | (ahi << ((32 - shift) & 31)), alo)
                    gv, gl = _vlc32(ww, rung)
                    v = jnp.where(isg, gv, jnp.where(isb, ww & 1, 0))
                    ln = jnp.where(isg, gl, jnp.where(isb, 1, 0))
                    out_ref[vi] = v
                    vi += 1
                    shift = shift + ln
                snz = shift != 0
                alo = jnp.where(snz, srl(alo, shift)
                                | (ahi << ((32 - shift) & 31)), alo)
                ahi = srl(ahi, shift)
                navail = navail - shift
                need = navail < 27
                fl = jnp.where(need, selreg(k), 0)
                sa = jnp.where(need, navail, 0)
                alo = alo | (fl << sa)
                ahi = ahi | jnp.where(need & (sa != 0),
                                      srl(fl, (32 - sa) & 31), 0)
                navail = navail + jnp.where(need, 32, 0)
                k = k + jnp.where(need, 1, 0)
        else:
            def value_step(i, off):
                wi = srl(off, 5)
                sh = off & 31
                r0, r1, r2 = selreg(wi), selreg(wi + 1), selreg(wi + 2)
                nz = sh != 0
                ish = (32 - sh) & 31
                wlo = jnp.where(nz, srl(r0, sh) | (r1 << ish), r0)
                if tbits == 16:
                    gv, gl = _vlc32w(wlo, rung)
                    v = jnp.where(isg, gv, jnp.where(isb, wlo & 1, 0))
                    ln = jnp.where(isg, gl, jnp.where(isb, 1, 0))
                    out_ref[i] = v
                else:
                    whi = jnp.where(nz, srl(r1, sh) | (r2 << ish), r1)
                    gvl, gvh, gl = _vlc64(wlo, whi, rung)
                    if tbits == 64:
                        extra = srl(r2, sh) & 1
                        gvh = gvh | jnp.where(isg & (gl == 65), extra << 30, 0)
                    v_lo = jnp.where(isg, gvl, jnp.where(isb, wlo & 1, 0))
                    v_hi = jnp.where(isg, gvh, 0)
                    ln = jnp.where(isg, gl, jnp.where(isb, 1, 0))
                    out_ref[i] = v_lo
                    out_ref[B2 + i] = v_hi
                return off + ln

            jax.lax.fori_loop(0, B2, value_step, off0)

    return kernel


def pick_g_blk(nbands: int):
    """Grid tile size (groups per step) for the in-kernel codeswitch parse,
    or None when unsupported: the per-step carry export needs
    G_BLK % nbands == 0 and Mosaic wants G_BLK/128 a multiple of 8."""
    if nbands in (1, 2, 4, 8, 16):
        return 1024
    if nbands in (3, 6, 12):
        return 3072
    return None


def fused_params(glens: np.ndarray, tbits: int, G_BLK: int = 1024):
    """Static (NREGW, R8, R8sub) from the stream's actual per-group bit
    lengths (host side; bucketed to bound recompiles).

    glens may be the flat multi-tile layout; spans are then computed by the
    caller-supplied offsets instead — use fused_params_from_offsets.
    """
    goff = np.concatenate([[0], np.cumsum(glens.astype(np.int64))])[:-1]
    return fused_params_from_offsets(goff, int(glens.max(initial=0)),
                                     tbits, G_BLK)


def fused_params_from_offsets(goff: np.ndarray, maxglen: int, tbits: int,
                              G_BLK: int = 1024):
    """(NREGW, R8, R8sub) from explicit group bit offsets (sorted)."""
    # walk span: chunk phase (<=255) + codeswitch + flag + values; u64 adds
    # the 65th-bit read one word past the window position
    need_bits = 256 + 16 + maxglen + (64 if tbits == 64 else 0)
    need_words = -(-need_bits // 32)
    nch = -(-need_words // 8)
    NREGW = nch * 8
    base8 = goff >> 8

    def spans(step):
        starts = base8[::step]
        if starts.size == 0:
            return 1
        stop = base8[-1] + 1 if base8.size else 1
        return int(np.diff(np.append(starts, stop)).max())

    # +128: window starts are rounded down to 128-chunk rows
    R8sub = -(-(spans(128) + nch + 2 + 128) // 128) * 128 + 128
    R8 = max(-(-(spans(G_BLK) + nch + 2 + 128) // 128) * 128, R8sub)
    return NREGW, R8, R8sub


@functools.partial(jax.jit, static_argnames=(
    "NREGW", "tbits", "R8", "R8sub", "G_BLK", "nbands", "interpret",
    "steps_per_tile"))
def wavefront_fused(words32, base8, off, rung, kind, NREGW: int, tbits: int,
                    R8: int, R8sub: int, G_BLK: int = 1024,
                    nbands: int | None = None, interpret: bool = False,
                    steps_per_tile: int = 0):
    """base8 (ngroups,) i32 sorted 8-word-aligned window chunk indices
    (bit_offset >> 8), off (ngroups,) i32 value-start bit offset within the
    window (phase + codeswitch + flag), rung/kind as the wavefront kernels
    (1 group / 2 bits / 0 zero) -> (ngroups, B2) u32 (8/16-bit) or u64
    mag-sign values.  ngroups % G_BLK == 0 (caller pads with kind=0).

    nbands (power of two <= 16): parse the codeswitch and run the
    band-segmented rung chain IN the kernel (off is then just the group
    start's bit phase, goff & 255, and rung/kind inputs are ignored) —
    removes the pre-gather entirely for FTL/BASE streams.

    steps_per_tile > 0: the flat-batch layout — every steps_per_tile grid
    steps a new independent stream starts and the rung chain resets
    (requires each tile's group count == steps_per_tile * G_BLK).
    """
    ngroups = base8.shape[0]
    n_tiles = ngroups // G_BLK
    G8 = G_BLK // 128
    nch = NREGW // 8

    # planar view, 128-chunk rows: P[k, rr, l] = words32[8*(rr*128+l) + k]
    R8P = -(-(R8 + nch + 128) // 128) * 128
    n8r = -(-words32.shape[0] // (8 * 128)) + R8P // 128
    wpad = n8r * 8 * 128 - words32.shape[0]
    if wpad:
        words32 = jnp.concatenate([words32, jnp.zeros(wpad, words32.dtype)])
    planar = jnp.transpose(words32.reshape(n8r, 128, 8), (2, 0, 1))
    planar = jax.lax.bitcast_convert_type(planar, jnp.int32)

    w8row = (base8[::G_BLK] >> 7).astype(jnp.int32)
    rel8 = (base8.reshape(n_tiles, G_BLK)
            - (w8row[:, None] << 7)).astype(jnp.int32)

    shape1 = (1, n_tiles * G8, 128)
    nrows = (B2 if tbits <= 16 else 2 * B2) + (1 if nbands else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # planar stream
            pl.BlockSpec((1, G8, 128), lambda t, ws: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G8, 128), lambda t, ws: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G8, 128), lambda t, ws: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G8, 128), lambda t, ws: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nrows, G8, 128), lambda t, ws: (0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, R8P // 128, 128), jnp.int32),
            pltpu.VMEM((8, R8P), jnp.int32),
            pltpu.VMEM((4 * nch * 8, R8), jnp.bfloat16),
            pltpu.VMEM((NREGW, G8, 128), jnp.int32),
            pltpu.SMEM((1, 16), jnp.int32),
            pltpu.VMEM((G8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _fused_kernel(NREGW, nch, G8, R8, R8P, R8sub, tbits, nbands,
                          steps_per_tile),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nrows, n_tiles * G8, 128),
                                           jnp.int32),
            interpret=interpret,
        )(w8row, planar,
          rel8.reshape(shape1),
          off.astype(jnp.int32).reshape(shape1),
          rung.astype(jnp.int32).reshape(shape1),
          kind.astype(jnp.int32).reshape(shape1))
    out = jax.lax.bitcast_convert_type(out, jnp.uint32).reshape(nrows, ngroups)
    rung_out = out[nrows - 1].astype(jnp.int32) if nbands else None
    if tbits <= 16:
        g = jnp.transpose(out[:B2])
    else:
        lo = jnp.transpose(out[:B2]).astype(jnp.uint64)
        hi = jnp.transpose(out[B2:2 * B2]).astype(jnp.uint64)
        g = lo | (hi << 32)
    return (g, rung_out) if nbands else g

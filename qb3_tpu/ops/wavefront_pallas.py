"""Pallas TPU kernel for the 16-value decode wavefront (8-bit lanes).

The XLA formulation of the walk (decode_indexed_narrow's scan) round-trips
every intermediate — accumulators, select chains, per-value lengths —
through HBM between ops; at batch scale that caps decode around
0.8 GB/s/tile.  This kernel keeps one group-tile's register windows, the
u64 accumulator (emulated as two u32 lanes; Mosaic has no 64-bit ints), and
all per-value state in VMEM/vregs for the whole walk: HBM traffic is one
read of the (NREG, G) window block and one write of the (16, G) values.

Group semantics mirror QB3decode.h:603-723: per group the accumulator
starts at the first value bit (codeswitch already consumed by the caller),
each value is an arithmetic 3-range VLC decode at the group rung with the
group-context middle swap, rung-0 groups emit literal bits (BITS) or zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import B2

srl = jax.lax.shift_right_logical


def _vlc32(w, rung):
    """Arithmetic group-context VLC decode on int32 bit patterns.

    rung in [1, 7] (u8 lanes); returns (value, length)."""
    r = jnp.maximum(rung, 1)
    rbit = jnp.int32(1) << r
    short = (w & 1) == 0
    n = srl(w, 1) & 1
    vmask = rbit - 1
    v2 = srl(w, 2) & vmask
    v = jnp.where(short, srl(w & vmask, 1),
                  jnp.where(n == 0, v2 | srl(rbit, 1), v2 | rbit))
    ln = jnp.where(short, r, r + 1 + n)
    # middle-value swap (rung 1: 1<->2, rung 2: 3<->4, >=3: 2^r-1 <-> 2^r)
    a = jnp.where(r == 1, jnp.int32(1),
                  jnp.where(r == 2, jnp.int32(3), rbit - 1))
    v = jnp.where(v == a, a + 1, jnp.where(v == a + 1, a, v))
    return v, ln


def _wavefront8_kernel(NREG: int, G8: int):
    PER = 3
    takes = np.minimum(PER, B2 - np.arange(0, B2, PER))

    def kernel(regs_ref, off_ref, rung_ref, kind_ref, out_ref):
        regs = [regs_ref[j] for j in range(NREG)]  # (G8, 128) int32 each
        zero = jnp.zeros_like(regs[0])
        regs = regs + [zero, zero]
        off = off_ref[0]
        rung = rung_ref[0]
        kind = kind_ref[0]  # 1 = group, 2 = bits, 0 = zero
        isg = kind == 1
        isb = kind == 2

        def selreg(k):
            out = regs[NREG + 1]
            for i in range(NREG, -1, -1):
                out = jnp.where(k == i, regs[i], out)
            return out

        sh = off & 31
        k0 = srl(off, 5)
        r0, r1, r2 = selreg(k0), selreg(k0 + 1), selreg(k0 + 2)
        # 64-bit accumulator (alo, ahi) = (r0 | r1<<32 | r2<<64) >> sh
        nz = sh != 0
        ish = (32 - sh) & 31
        alo = jnp.where(nz, srl(r0, sh) | (r1 << ish), r0)
        ahi = jnp.where(nz, srl(r1, sh) | (r2 << ish), r1)
        navail = 64 - sh
        k = k0 + 2

        vi = 0
        for take in takes:
            shift = jnp.zeros_like(off)
            for t in range(int(take)):
                snz = shift != 0
                ww = jnp.where(snz, srl(alo, shift)
                               | (ahi << ((32 - shift) & 31)), alo)
                gv, gl = _vlc32(ww, rung)
                v = jnp.where(isg, gv, jnp.where(isb, ww & 1, 0))
                ln = jnp.where(isg, gl, jnp.where(isb, 1, 0))
                out_ref[vi] = v
                vi += 1
                shift = shift + ln
            # consume + refill (u8 macro step uses <= 27 bits < one word)
            snz = shift != 0
            alo = jnp.where(snz, srl(alo, shift) | (ahi << ((32 - shift) & 31)),
                            alo)
            ahi = srl(ahi, shift)
            navail = navail - shift
            need = navail < 27
            fl = jnp.where(need, selreg(k), 0)
            sa = jnp.where(need, navail, 0)  # in [0, 26] when need
            alo = alo | (fl << sa)
            # sa == 0: the fill lands entirely in alo (fl >> 32 == 0)
            ahi = ahi | jnp.where(need & (sa != 0), srl(fl, (32 - sa) & 31), 0)
            navail = navail + jnp.where(need, 32, 0)
            k = k + jnp.where(need, 1, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("NREG", "G_BLK", "interpret"))
def wavefront8(regs_arr, off, rung, kind, NREG: int = 8, G_BLK: int = 1024,
               interpret: bool = False):
    """regs_arr (ngroups, NREG) u32 register windows (base = bit>>5), off
    (ngroups,) i32 value-start bit phase within the window (< 64), rung
    (ngroups,) i32, kind (ngroups,) i32 (1 group / 2 bits / 0 zero)
    -> (ngroups, B2) u32 mag-sign values.  ngroups % G_BLK == 0.
    """
    ngroups = regs_arr.shape[0]
    G8 = G_BLK // 128
    n_tiles = ngroups // G_BLK
    regsT = jnp.transpose(regs_arr).reshape(NREG, n_tiles * G8, 128)
    regsT = jax.lax.bitcast_convert_type(regsT, jnp.int32)
    shape1 = (1, n_tiles * G8, 128)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _wavefront8_kernel(NREG, G8),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((NREG, G8, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G8, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G8, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G8, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B2, G8, 128), lambda t: (0, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B2, n_tiles * G8, 128), jnp.int32),
            interpret=interpret,
        )(regsT,
          off.astype(jnp.int32).reshape(shape1),
          rung.astype(jnp.int32).reshape(shape1),
          kind.astype(jnp.int32).reshape(shape1))
    out = jax.lax.bitcast_convert_type(out, jnp.uint32)
    return jnp.transpose(out.reshape(B2, ngroups), (1, 0))


# --------------------------------------------------------- wide-type variant

def _vlc32w(w, rung):
    """_vlc32 with the swap gated to rung <= 7 (u16 lanes reach rung 15;
    the group-context middle swap only exists for the tabled rungs,
    QB3decode.h:21-23)."""
    r = jnp.maximum(rung, 1)
    rbit = jnp.int32(1) << (r & 31)
    short = (w & 1) == 0
    n = srl(w, 1) & 1
    vmask = rbit - 1
    v2 = srl(w, 2) & vmask
    v = jnp.where(short, srl(w & vmask, 1),
                  jnp.where(n == 0, v2 | srl(rbit, 1), v2 | rbit))
    ln = jnp.where(short, r, r + 1 + n)
    a = jnp.where(r == 1, jnp.int32(1),
                  jnp.where(r == 2, jnp.int32(3), rbit - 1))
    do = r <= 7
    v = jnp.where(do & (v == a), a + 1, jnp.where(do & (v == a + 1), a, v))
    return v, ln


def _vlc64(wlo, whi, rung):
    """Group-context VLC decode on a 64-bit window held as two i32 lanes.

    rung in [1, 63]; returns (vlo, vhi, len) with len up to 65 (the rung-63
    long form; its 65th bit — value bit 62 — is OR-ed in by the caller)."""
    r = jnp.maximum(rung, 1)
    lo32 = r < 32
    rlo = jnp.where(lo32, jnp.int32(1) << (r & 31), 0)
    rhi = jnp.where(lo32, 0, jnp.int32(1) << ((r - 32) & 31))
    vmlo = jnp.where(lo32, rlo - 1, jnp.int32(-1))
    vmhi = jnp.where(lo32, 0, rhi - 1)
    short = (wlo & 1) == 0
    n = srl(wlo, 1) & 1
    # (w & vmask) >> 1
    slo = wlo & vmlo
    shi = whi & vmhi
    vs_lo = srl(slo, 1) | (shi << 31)
    vs_hi = srl(shi, 1)
    # (w >> 2) & vmask
    w2lo = (srl(wlo, 2) | (whi << 30)) & vmlo
    w2hi = srl(whi, 2) & vmhi
    # rbit >> 1
    hlo = srl(rlo, 1) | (rhi << 31)
    hhi = srl(rhi, 1)
    vlo = jnp.where(short, vs_lo,
                    jnp.where(n == 0, w2lo | hlo, w2lo | rlo))
    vhi = jnp.where(short, vs_hi,
                    jnp.where(n == 0, w2hi | hhi, w2hi | rhi))
    ln = jnp.where(short, r, r + 1 + n)
    # group-context swap, tabled rungs only (values fit the low lane there)
    a = jnp.where(r == 1, jnp.int32(1),
                  jnp.where(r == 2, jnp.int32(3),
                            (jnp.int32(1) << jnp.clip(r, 0, 7)) - 1))
    do = (r <= 7) & (vhi == 0)
    vlo = jnp.where(do & (vlo == a), a + 1,
                    jnp.where(do & (vlo == a + 1), a, vlo))
    return vlo, vhi, ln


def _wavefront_wide_kernel(NREG: int, G8: int, tbits: int):
    """16-value walk for u16/u32/u64 lanes: the register window, the
    per-value 64-bit window build, and the VLC chain all stay in
    VMEM/vregs (the XLA formulation round-trips HBM per select)."""

    def kernel(regs_ref, off_ref, rung_ref, kind_ref, out_ref):
        regs = [regs_ref[j] for j in range(NREG)]
        zero = jnp.zeros_like(regs[0])
        regs = regs + [zero, zero, zero]
        off0 = off_ref[0]
        rung = rung_ref[0]
        kind = kind_ref[0]
        isg = kind == 1
        isb = kind == 2

        def selreg(k):
            out = regs[NREG + 2]
            for i in range(NREG + 1, -1, -1):
                out = jnp.where(k == i, regs[i], out)
            return out

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
                    # rung-63 long form: the 65th stream bit is value bit 62
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


@functools.partial(jax.jit, static_argnames=("NREG", "tbits", "G_BLK",
                                             "interpret"))
def wavefront_wide(regs_arr, off, rung, kind, NREG: int, tbits: int,
                   G_BLK: int = 1024, interpret: bool = False):
    """Wide-lane sibling of wavefront8: regs_arr (ngroups, NREG) u32
    register windows, off (ngroups,) i32 value-start phase (< 64), rung,
    kind (1 group / 2 bits / 0 zero) -> (ngroups, B2) uint64 mag-sign
    values (u16 path returns the same dtype for a uniform caller).
    ngroups % G_BLK == 0."""
    ngroups = regs_arr.shape[0]
    G8 = G_BLK // 128
    n_tiles = ngroups // G_BLK
    regsT = jnp.transpose(regs_arr).reshape(NREG, n_tiles * G8, 128)
    regsT = jax.lax.bitcast_convert_type(regsT, jnp.int32)
    shape1 = (1, n_tiles * G8, 128)
    nrows = B2 if tbits == 16 else 2 * B2
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _wavefront_wide_kernel(NREG, G8, tbits),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((NREG, G8, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G8, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G8, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G8, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nrows, G8, 128), lambda t: (0, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nrows, n_tiles * G8, 128),
                                           jnp.int32),
            interpret=interpret,
        )(regsT,
          off.astype(jnp.int32).reshape(shape1),
          rung.astype(jnp.int32).reshape(shape1),
          kind.astype(jnp.int32).reshape(shape1))
    out = jax.lax.bitcast_convert_type(out, jnp.uint32).reshape(nrows, ngroups)
    if tbits == 16:
        return jnp.transpose(out).astype(jnp.uint64)
    lo = jnp.transpose(out[:B2]).astype(jnp.uint64)
    hi = jnp.transpose(out[B2:]).astype(jnp.uint64)
    return lo | (hi << 32)

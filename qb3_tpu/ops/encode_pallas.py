"""Fused image-layout encode kernel (wide types): relayout + VLC + pack.

Phase A's (H/B, B, W/B, B) block transpose is XLA's weakest op on wide
elements (~3 ms of the 7 ms u64 encode).  Here the image never leaves
(H, W, C) layout on the XLA side (ops/encode_image.py computes mags, rungs
and lengths elementwise); this kernel consumes mag-sign PLANES in image
layout and, per block-row tile:

  1. relayout: one bf16 one-hot matmul per 128-group subtile pulls all 16
     curve-ordered values of 128 groups out of the slab — A rows are
     (dx-roll, plane, byte) copies of the 4 slab rows, B is the one-hot of
     each group's base lane, so out rows enumerate (dy, dx, plane, byte);
  2. VLC: the 3-range group code (QB3encode.h:132-141) evaluated on
     u32-pair lanes, including the rung-63 65-bit long form;
  3. fold + place: same scheme as pack_pallas._pack_chunks_kernel — codes
     fold into an 8-word-aligned slab at intra-group offsets, one one-hot
     MXU matmul per subtile places slabs into the output stream planes.

Stream bytes are identical to pack_groups_chunked over encode_fast_blocks
(the conformance tests pin both to the reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import B, B2, curve_offsets

srl = jax.lax.shift_right_logical


def _enc_pair(vlo, vhi, rung):
    """Group-context VLC encode on a mag-sign value held as two i32 lanes.

    rung >= 1; returns (clo, chi, ln) where ln includes the 65-bit long
    form (the caller emits min(ln, 64) code bits then value bit 62).
    Mirrors ops/encode.value_codes_arith on pair lanes.
    """
    r = jnp.maximum(rung, 1)
    lo32 = r < 32
    rlo = jnp.where(lo32, jnp.int32(1) << (r & 31), 0)
    rhi = jnp.where(lo32, 0, jnp.int32(1) << ((r - 32) & 31))
    # group-context swap (tabled rungs only; the value fits the low lane)
    a = jnp.where(r == 1, jnp.int32(1),
                  jnp.where(r == 2, jnp.int32(3),
                            (jnp.int32(1) << jnp.clip(r, 0, 7)) - 1))
    do = (r <= 7) & (vhi == 0)
    vlo = jnp.where(do & (vlo == a), a + 1,
                    jnp.where(do & (vlo == a + 1), a, vlo))
    # top = bit r, nxt = bit r-1 of the (swapped) value
    top = jnp.where(lo32, srl(vlo, r & 31), srl(vhi, (r - 32) & 31)) & 1
    r1 = r - 1
    nxt = jnp.where(r1 < 32, srl(vlo, r1 & 31), srl(vhi, (r1 - 32) & 31)) & 1
    ln = r + top + (top | nxt)

    def shl1(lo, hi):
        return lo << 1, (hi << 1) | srl(lo, 31)

    def shl2(lo, hi):
        return lo << 2, (hi << 2) | srl(lo, 30)

    s1lo, s1hi = shl1(vlo, vhi)  # short: v << 1
    # nominal: ((v ^ 2^(r-1)) << 2) | 1
    hlo = srl(rlo, 1) | (rhi << 31)
    hhi = srl(rhi, 1)
    n2lo, n2hi = shl2(vlo ^ hlo, vhi ^ hhi)
    # long: ((v ^ 2^r) << 2) | 3
    l2lo, l2hi = shl2(vlo ^ rlo, vhi ^ rhi)
    clo = jnp.where(top == 1, l2lo | 3, jnp.where(nxt == 1, n2lo | 1, s1lo))
    chi = jnp.where(top == 1, l2hi, jnp.where(nxt == 1, n2hi, s1hi))
    return clo, chi, ln


def _encode_pack_kernel(PL: int, SUBT: int, W48: int, R8T: int, WC: int,
                        WCpad: int, KW: int, tbits: int):
    nch = W48 // 8
    NROW = 16 * PL * 4  # (dy, dx) x plane x byte

    def row_of(dx, p, bb, dy):
        return ((dx * PL + p) * 2 + (bb >> 1)) * 8 + (bb & 1) * 4 + dy

    offs = None  # bound at call time via closure param

    def kernel(ws8_ref, mlo_ref, mhi_ref, rung_ref, kind_ref, pcode_ref,
               plen_ref, pcomb_ref, rel8_ref, blane_ref, out_ref, a_ref,
               slab_ref, curve):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            # zero once: lanes >= WC are never selected but a NaN bit
            # pattern in uninitialized bf16 scratch would poison 0-products
            a_ref[...] = jnp.zeros_like(a_ref)

        planes = [mlo_ref[0]] + ([mhi_ref[0]] if PL == 2 else [])
        # A: rows (dx, plane, byte-pair) of dx-rolled slab byte planes
        for dx in range(4):
            for p in range(PL):
                pla = planes[p]
                rolled = (pltpu.roll(pla, WC - dx * curve["C"], 1)
                          if dx else pla)
                for bbp in range(2):
                    b0 = (srl(rolled, 8 * (2 * bbp)) & 255)
                    b1 = (srl(rolled, 8 * (2 * bbp + 1)) & 255)
                    blk = jnp.concatenate([b0, b1], axis=0).astype(
                        jnp.bfloat16)
                    r0 = ((dx * PL + p) * 2 + bbp) * 8
                    a_ref[r0:r0 + 8, :WC] = blk

        nspan = {16: 2, 32: 3, 64: 4}[tbits]
        for k in range(SUBT):
            st = t * SUBT + k
            L0 = min(max(0, k * 512 - 128), max(0, WCpad - KW))
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (KW, 128), 0)
                      == (blane_ref[0, k, :].reshape(1, 128) - L0)
                      ).astype(jnp.bfloat16)
            mm = jax.lax.dot_general(
                a_ref[:, pl.ds(L0, KW)], onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            def vplane(p):
                # (16, 128) curve-ordered values of plane p, bytes combined
                rows = []
                for v in range(B2):
                    dy, dx = curve["offs"][v]
                    r = row_of(dx, p, 0, dy)
                    rows.append(mm[r:r + 1, :])
                acc = jnp.concatenate(rows, axis=0).astype(jnp.int32)
                for bb in range(1, 4):
                    rows = []
                    for v in range(B2):
                        dy, dx = curve["offs"][v]
                        r = row_of(dx, p, bb, dy)
                        rows.append(mm[r:r + 1, :])
                    acc = acc + (jnp.concatenate(rows, axis=0)
                                 .astype(jnp.int32) << (8 * bb))
                return acc

            vlo = vplane(0)
            vhi = vplane(1) if PL == 2 else jnp.zeros_like(vlo)
            rung = rung_ref[0, k].reshape(1, 128)
            kind = kind_ref[0, k].reshape(1, 128)
            isg = kind == 0
            isb = kind == 1
            # batched VLC over all 16 values (full-VPU (16, 128) lanes)
            clo, chi, ln = _enc_pair(vlo, vhi, rung)
            clo = jnp.where(isg, clo, jnp.where(isb, vlo & 1, 0))
            chi = jnp.where(isg, chi, 0)
            ln = jnp.where(isg, ln, jnp.where(isb, 1, 0))
            if tbits == 64:
                # fold the 65th bit (value bit 62) into a third code limb
                ovf = isg & (ln == 65)
                cex = jnp.where(ovf, srl(vhi, 30) & 1, 0)
            else:
                cex = jnp.zeros_like(clo)
            # per-symbol start offsets: exclusive prefix over the 16 lens
            csum = ln
            d = 1
            sub16 = jax.lax.broadcasted_iota(jnp.int32, (B2, 128), 0)
            while d < B2:
                csum = csum + jnp.where(sub16 >= d, pltpu.roll(csum, d, 0), 0)
                d *= 2
            plen_row = plen_ref[0, k].reshape(1, 128)
            io = plen_row + csum - ln  # exclusive
            pcomb = pcomb_ref[0, k].reshape(1, 128)
            wio = jax.lax.broadcasted_iota(jnp.int32, (W48, 128), 0)
            slab_ref[...] = jnp.zeros((W48, 128), jnp.int32)

            def emit(bp, lo_c, hi_c, ex_c):
                ks = srl(bp, 5)
                sh = bp & 31
                nz = sh != 0
                ish = (32 - sh) & 31
                lo = lo_c << sh
                mid = jnp.where(nz, srl(lo_c, ish) | (hi_c << sh), hi_c)
                add = jnp.where(wio == ks, lo, 0)
                add = add + jnp.where(wio == ks + 1, mid, 0)
                if nspan >= 3:
                    hi = jnp.where(nz, srl(hi_c, ish) | (ex_c << sh), ex_c)
                    add = add + jnp.where(wio == ks + 2, hi, 0)
                if nspan >= 4:
                    hi2 = jnp.where(nz, srl(ex_c, ish), 0)
                    add = add + jnp.where(wio == ks + 3, hi2, 0)
                slab_ref[...] = slab_ref[...] + add

            emit(pcomb, pcode_ref[0, k].reshape(1, 128),
                 jnp.zeros_like(pcomb), jnp.zeros_like(pcomb))
            for v in range(B2):
                emit(pcomb + io[v:v + 1, :], clo[v:v + 1, :],
                     chi[v:v + 1, :], cex[v:v + 1, :])

            # place: byte planes stacked in lanes -> ONE one-hot matmul
            start8 = pl.multiple_of(ws8_ref[st], 128)
            slabG = jnp.transpose(slab_ref[...], (1, 0))  # (128, W48)
            r8io = jax.lax.broadcasted_iota(jnp.int32, (R8T, 128), 0)
            mask = (r8io == rel8_ref[0, k].reshape(1, 128)).astype(
                jnp.bfloat16)
            rowio = jax.lax.broadcasted_iota(jnp.int32, (R8T, 8), 0)
            # concat in int32, then convert: bf16 lane-concat of more than
            # two sub-tile pieces silently drops the third (observed)
            bytes_all = jnp.concatenate(
                [(srl(slabG, 8 * b)) & 255 for b in range(4)],
                axis=1).astype(jnp.bfloat16)  # (128, 4*W48)
            Mall = jax.lax.dot_general(
                mask, bytes_all, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            word = jnp.zeros((R8T, 8), jnp.int32)
            for b in range(4):
                # roll the wanted byte segment to lane 0 before slicing:
                # lane slices at non-zero sub-tile offsets miscompile here
                Mb = (pltpu.roll(Mall, 4 * W48 - b * W48, 1)[:, :W48]
                      if b else Mall[:, :W48])
                res = Mb[:, 0:8]
                for c in range(1, nch):
                    rolled = pltpu.roll(Mb[:, c * 8: c * 8 + 8], c, 0)
                    res = res + jnp.where(rowio >= c, rolled, jnp.float32(0))
                word = word + (res.astype(jnp.int32) << (8 * b))
            planes_out = jnp.transpose(word, (1, 0))  # (8, R8T)

            prev8 = ws8_ref[jnp.maximum(st - 1, 0)]
            fresh_from = jnp.where(st == 0, 0, prev8 + R8T - start8)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, R8T), 1)
            win = out_ref[:, pl.ds(start8, R8T)]
            kept = jnp.where(lane >= fresh_from, jnp.int32(0), win)
            out_ref[:, pl.ds(start8, R8T)] = kept + planes_out

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "tbits", "n_words", "max_group_bits", "nbx", "C", "order", "interpret"))
def encode_pack_image(m_lo, m_hi, rung, gkind, pcode, plen, glen, tbits: int,
                      n_words: int, max_group_bits: int, nbx: int, C: int,
                      order: int, interpret: bool = False):
    """Pack an image's groups straight from image-layout mag-sign planes.

    m_lo/m_hi: (H, W, C) u32 pair planes (m_hi None for <= 32-bit types);
    rung/gkind/pcode/plen/glen: flat (ngroups,) per-group arrays in
    raster-block x band order.  Requires H % 4 == 0, W % 4 == 0 and
    (nbx * C) % 128 == 0 (one block-row per grid tile).  Returns
    (words u32 (n_out,), total_bits, glen_u16).
    """
    h = m_lo.shape[0]
    nby = h // B
    G_tile = nbx * C
    SUBT = G_tile // 128
    ngroups = nby * G_tile
    PL = 2 if tbits == 64 else 1
    WC = B * nbx * C
    WCpad = -(-(WC + 128) // 128) * 128
    KW = min(768, WCpad)

    mlo = jax.lax.bitcast_convert_type(m_lo.reshape(nby, B, WC), jnp.int32)
    if m_hi is not None:
        mhi = jax.lax.bitcast_convert_type(m_hi.reshape(nby, B, WC),
                                           jnp.int32)
    else:
        mhi = mlo[:, :1, :1]  # unused placeholder

    # per-group placement metadata (pack_groups_chunked scheme, per-subtile
    # 1024-word-aligned windows)
    glen_i = glen.astype(jnp.int32)
    gend = jnp.cumsum(glen_i.astype(jnp.int64))
    total = gend[-1]
    goff = gend - glen_i
    base = (goff >> 5).astype(jnp.int32)
    phase = (goff & 31).astype(jnp.int32)
    wstart = (base[::128] >> 10) << 10
    rel = base.reshape(-1, 128) - wstart[:, None]
    pcomb = ((rel & 7) << 5) + phase.reshape(-1, 128)
    rel8 = rel >> 3

    W48 = -(-((31 + max_group_bits + 31) // 32 + 7) // 8) * 8
    # byte-plane segments of the stacked place operand must not cross a
    # 128-lane tile boundary (observed miscompile): round W48 to a divisor
    # of 128
    for d in (16, 32, 64, 128):
        if W48 <= d:
            W48 = d
            break
    R = (128 * max_group_bits) // 32 + 1024 + W48 + 16
    R = -(-R // 1024) * 1024
    R8T = R // 8
    n_out = -(-n_words // 1024) * 1024 + R
    NW8 = n_out // 8

    # in-tile base lane of each group: 4*(block)*C + band
    gi = np.arange(G_tile, dtype=np.int32)
    blane_row = (4 * (gi // C) * C + gi % C).astype(np.int32)
    blane = jnp.broadcast_to(jnp.asarray(blane_row).reshape(1, SUBT, 128),
                             (nby, SUBT, 128))

    def row3(x):
        return x.astype(jnp.int32).reshape(nby, SUBT, 128)

    offs = curve_offsets(order)
    kernel = _encode_pack_kernel(PL, SUBT, W48, R8T, WC, WCpad, KW, tbits)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nby,),
        in_specs=[
            pl.BlockSpec((1, B, WC), lambda t, ws: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mhi.shape[1], mhi.shape[2]),
                         lambda t, ws: (t if mhi.shape[1] == B else 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, SUBT, 128), lambda t, ws: (t, 0, 0),
                          memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((16 * PL * 4, WCpad), jnp.bfloat16),
            pltpu.VMEM((W48, 128), jnp.int32),
        ],
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(kernel, curve={"offs": offs, "C": C}),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, NW8), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )((wstart >> 3).astype(jnp.int32),
          mlo, mhi, row3(rung), row3(gkind),
          row3(jax.lax.bitcast_convert_type(pcode.astype(jnp.uint32),
                                            jnp.int32)),
          row3(plen), row3(pcomb), row3(rel8), blane)
    words = jax.lax.bitcast_convert_type(
        jnp.transpose(out, (1, 0)), jnp.uint32).reshape(-1)[:n_words]
    return words, total, glen_i.astype(jnp.uint16)

"""Pallas TPU kernel for bitstream placement (phase B level 2).

XLA's scatter-add serializes per update (~12ns each on v5e), making slab
placement the dominant encode cost. This kernel replaces it: the grid walks
group tiles sequentially (TPU grid semantics), each tile accumulates its
groups' word slabs into a VMEM window with vectorized lane masks, and the
window is read-modify-written into the output stream at the tile's word
offset. Overlapping seams are safe because grid steps run sequentially and
contributions touch disjoint bits; each tile zeroes the part of its window
no earlier tile covered, so the output needs no separate initialization.

Host-side prep (place_slabs): per-group slabs/bases exactly as produced by
ops/bitpack.pack_groups' fold, plus per-tile window starts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8  # default groups per vector step (sublane dimension)


def _placement_kernel(R: int, G: int, W: int, SUB: int):
    def kernel(wstart_ref, rel_ref, slab_ref, out_ref, acc_ref):
        t = pl.program_id(0)
        start = pl.multiple_of(wstart_ref[t], 128)  # host aligns window starts
        iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, R), 1)
        acc_ref[...] = jnp.zeros((SUB, R), jnp.int32)

        def body(i, _):
            rel = rel_ref[0, i].reshape(SUB, 1)
            sl = slab_ref[0, i]  # (SUB, W)
            add = jnp.zeros((SUB, R), jnp.int32)
            for j in range(W):
                v = sl[:, j].reshape(SUB, 1)
                add = add + jnp.where(iota == rel + j, v, jnp.int32(0))
            acc_ref[...] = acc_ref[...] + add
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(G // SUB), body,
                          jnp.int32(0))
        # zero the window region no earlier tile covered: global word index
        # start + k is fresh when >= prev_start + R (everything, for tile 0)
        prev_start = wstart_ref[jnp.maximum(t - 1, 0)]
        fresh_from = jnp.where(t == 0, jnp.int32(0), prev_start + R - start)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
        win = out_ref[:, pl.ds(start, R)]
        kept = jnp.where(lane >= fresh_from, jnp.int32(0), win)
        out_ref[:, pl.ds(start, R)] = (
            kept + jnp.sum(acc_ref[...], axis=0, dtype=jnp.int32)[None, :])

    return kernel


def _gather_kernel(R: int, G: int, W: int, SUB: int):
    """Reverse of the placement kernel: per group, collect W consecutive u32
    words starting at its (tile-relative) word offset, via lane masks over
    the tile's contiguous stream window."""

    def kernel(wstart_ref, rel_ref, words_ref, out_ref):
        t = pl.program_id(0)
        start = pl.multiple_of(wstart_ref[t], 128)
        win = words_ref[:, pl.ds(start, R)]  # (1, R)
        iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, R), 1)

        def body(i, _):
            rel = rel_ref[0, i].reshape(SUB, 1)
            winb = jnp.broadcast_to(win, (SUB, R))
            for j in range(W):
                w = jnp.sum(jnp.where(iota == rel + j, winb, jnp.int32(0)),
                            axis=1, dtype=jnp.int32)
                out_ref[0, i, :, j] = w
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(G // SUB), body,
                          jnp.int32(0))

    return kernel


def _pack_chunks_kernel(S: int, G: int, W48: int, R8T: int, wide: bool):
    """Fused fold + placement for one tile of G groups.

    Stage A folds each group's pre-shifted symbol contributions into a
    (W48, G) slab (phase folded into the word index, so slabs are 8-word
    aligned); stage B places all slabs with ONE f32 one-hot matmul on the
    MXU — mask (R8T, G) @ slab bytes (G, 4*W48) — followed by a static
    diagonal combine.  Exactness: one-hot rows select single byte values,
    and bytes from different groups overlap only on disjoint bits, so the
    f32 sums stay <= 255 per byte and reassemble to the serial stream's OR.
    """
    nch = W48 // 8
    srl = jax.lax.shift_right_logical

    def kernel(ws8_ref, rel8_ref, pcomb_ref, lens_ref, code_ref, out_ref,
               slab_ref):
        t = pl.program_id(0)
        start8 = pl.multiple_of(ws8_ref[t], 128)
        wio = jax.lax.broadcasted_iota(jnp.int32, (W48, G), 0)
        slab_ref[...] = jnp.zeros((W48, G), jnp.int32)
        # stage A with the per-symbol prep fused in: the intra-group length
        # cumsum, bit phase, and the u32-pair code shifts all run on dense
        # (1, G) rows here instead of lane-padded (ngroups, S) XLA arrays
        pcomb = pcomb_ref[0, 0, :].reshape(1, G)
        io = jnp.zeros((1, G), jnp.int32)
        for s in range(S):
            ln = lens_ref[s, :].reshape(1, G)
            bp = pcomb + io
            io = io + ln
            ks = srl(bp, 5)
            sh = bp & 31
            nz = sh != 0
            ish = 32 - sh
            if wide:
                lo32 = code_ref[2 * s, :].reshape(1, G)
                hi32 = code_ref[2 * s + 1, :].reshape(1, G)
                lo = lo32 << sh
                mid = jnp.where(nz, srl(lo32, ish) | (hi32 << sh), hi32)
                hi = jnp.where(nz, srl(hi32, ish), 0)
            else:
                lo32 = code_ref[s, :].reshape(1, G)
                lo = lo32 << sh
                mid = jnp.where(nz, srl(lo32, ish), 0)
            add = jnp.where(wio == ks, lo, 0)
            add = add + jnp.where(wio == ks + 1, mid, 0)
            if wide:
                add = add + jnp.where(wio == ks + 2, hi, 0)
            slab_ref[...] = slab_ref[...] + add

        slabG = jnp.transpose(slab_ref[...], (1, 0))  # (G, W48)
        r8io = jax.lax.broadcasted_iota(jnp.int32, (R8T, G), 0)
        mask = (r8io == rel8_ref[0, 0, :].reshape(1, G)).astype(jnp.bfloat16)
        rowio = jax.lax.broadcasted_iota(jnp.int32, (R8T, 8), 0)
        # per-byte one-hot matmuls (bytes <= 255 are exact in bf16), then a
        # diagonal combine: plane (b, kk) at chunk r8 collects slab word
        # c*8+kk placed by groups at chunk r8-c
        word = jnp.zeros((R8T, 8), jnp.int32)
        for b in range(4):
            byteb = ((slabG >> (8 * b)) & 255).astype(jnp.bfloat16)
            Mb = jax.lax.dot_general(mask, byteb, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            res = Mb[:, 0:8]
            for c in range(1, nch):
                rolled = pltpu.roll(Mb[:, c * 8 : c * 8 + 8], c, 0)
                res = res + jnp.where(rowio >= c, rolled, jnp.float32(0))
            word = word + (res.astype(jnp.int32) << (8 * b))
        planes = jnp.transpose(word, (1, 0))  # (8, R8T)

        prev8 = ws8_ref[jnp.maximum(t - 1, 0)]
        fresh_from = jnp.where(t == 0, 0, prev8 + R8T - start8)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, R8T), 1)
        win = out_ref[:, pl.ds(start8, R8T)]
        kept = jnp.where(lane >= fresh_from, jnp.int32(0), win)
        out_ref[:, pl.ds(start8, R8T)] = kept + planes

    return kernel


@functools.partial(jax.jit, static_argnames=("n_words", "max_group_bits", "G",
                                             "interpret"))
def pack_groups_chunked(codes, lens, n_words: int, max_group_bits: int,
                        G: int = 128, interpret: bool = False):
    """pack_groups via the fused fold+place kernel: slabs never touch HBM
    and placement is an MXU one-hot matmul per tile instead of O(W x R)
    masked passes.  Drop-in signature/semantics of pack_groups."""
    ngroups, S = codes.shape
    wide = codes.dtype == jnp.uint64
    lens_i = lens.astype(jnp.int32)
    glen = jnp.sum(lens_i, axis=1)
    gend = jnp.cumsum(glen.astype(jnp.int64))
    total = gend[-1]
    goff = gend - glen
    W = (31 + max_group_bits + 31) // 32
    W48 = -(-(W + 7) // 8) * 8
    base = (goff >> 5).astype(jnp.int32)
    phase = (goff & 31).astype(jnp.int32)

    pad = (-ngroups) % G
    if pad:
        codes = jnp.concatenate([codes, jnp.zeros((pad, S), codes.dtype)])
        lens_i = jnp.concatenate([lens_i, jnp.zeros((pad, S), jnp.int32)])
        base = jnp.concatenate([base, jnp.broadcast_to(base[-1], (pad,))])
        phase = jnp.concatenate([phase, jnp.zeros(pad, jnp.int32)])
    n_tiles = base.shape[0] // G
    wstart = (base[::G] >> 10) << 10  # 1024-word aligned windows
    rel = base.reshape(n_tiles, G) - wstart[:, None]
    pcomb = ((rel.reshape(-1) & 7) << 5) + phase  # 8-word + bit phase
    rel8 = rel >> 3
    R = (G * max_group_bits) // 32 + 1024 + W48 + 16
    R = -(-R // 1024) * 1024
    R8T = R // 8
    n_out = -(-n_words // 1024) * 1024 + R
    NW8 = n_out // 8

    lensT = jnp.transpose(lens_i)  # (S, npad)
    if wide:
        c2 = jax.lax.bitcast_convert_type(codes, jnp.uint32)  # (n, S, 2)
        codeT = jnp.transpose(c2.reshape(-1, 2 * S))  # rows 2s=lo, 2s+1=hi
    else:
        codeT = jnp.transpose(codes.astype(jnp.uint32))
    codeT = jax.lax.bitcast_convert_type(codeT, jnp.int32)
    SC = codeT.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, G), lambda t, ws: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda t, ws: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, G), lambda t, ws: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SC, G), lambda t, ws: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W48, G), jnp.int32)],
    )
    kernel = _pack_chunks_kernel(S, G, W48, R8T, wide)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, NW8), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )((wstart >> 3).astype(jnp.int32),
          rel8.astype(jnp.int32).reshape(n_tiles, 1, G),
          pcomb.astype(jnp.int32).reshape(n_tiles, 1, G),
          lensT, codeT)
    words = jax.lax.bitcast_convert_type(
        jnp.transpose(out, (1, 0)), jnp.uint32).reshape(-1)[:n_words]
    return words, total, glen.astype(jnp.uint16)


def _extract_kernel(nrows: int, tb: int):
    """Batched window DMA: each grid step issues ``tb`` window copies
    before waiting on any, so the copies overlap and the per-step grid
    overhead amortizes — one-DMA-per-step with a blocking wait measured
    2.2 ms for 512 windows on the u64 gather vs 1.7 ms batched x8."""
    def kernel(wrow_ref, words_ref, out_ref, sems):
        t = pl.program_id(0)

        def dma(j):
            return pltpu.make_async_copy(
                words_ref.at[pl.ds(wrow_ref[t * tb + j], nrows)],
                out_ref.at[j], sems.at[j])

        for j in range(tb):
            dma(j).start()
        for j in range(tb):
            dma(j).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("R", "interpret"))
def extract_windows(words32, wrow, R: int, interpret: bool = False):
    """Per-tile stream windows by direct DMA: out[t] = words32 rows
    [wrow[t], wrow[t] + R/128) of the (n, 128) row view -> (n_tiles, R) u32.

    Replaces the one-hot row matmul (O(n_tiles * total_rows) one-hot bytes)
    with n_tiles dynamic-offset HBM->VMEM copies; wrow must be row indices
    (the caller's 128-aligned window starts >> 7) within bounds.
    """
    n_tiles = wrow.shape[0]
    nrows = R // 128
    TB = 8
    tpad = (-n_tiles) % TB
    if tpad:
        wrow = jnp.concatenate([wrow, jnp.broadcast_to(wrow[-1], (tpad,))])
    wpad = (-words32.shape[0]) % 128
    if wpad:
        words32 = jnp.concatenate([words32, jnp.zeros(wpad, words32.dtype)])
    words2d = jax.lax.bitcast_convert_type(words32, jnp.int32).reshape(-1, 128)
    # DMA slack: the last window may extend past the stream
    words2d = jnp.concatenate(
        [words2d, jnp.zeros((nrows, 128), jnp.int32)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((n_tiles + tpad) // TB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TB, nrows, 128), lambda t, ws: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((TB,))],
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _extract_kernel(nrows, TB),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles + tpad, nrows, 128),
                                           jnp.int32),
            interpret=interpret,
        )(wrow.astype(jnp.int32), words2d)
    out = out[:n_tiles]
    return jax.lax.bitcast_convert_type(out, jnp.uint32).reshape(n_tiles, R)


@functools.partial(jax.jit, static_argnames=("G", "W", "R", "interpret", "sub"))
def gather_slabs(words32, base, G: int, W: int, R: int,
                 interpret: bool = False, sub: int = SUB):
    """words32 (n_words,) u32, base (ngroups,) i32 sorted word offsets ->
    (ngroups, W) u32 where out[g, j] = words32[base[g] + j].

    ngroups must be a multiple of G; R must cover a tile's word span plus
    alignment slack (128) plus W.
    """
    SUBv = sub
    ngroups = base.shape[0]
    n_tiles = ngroups // G
    wstart = (base[::G] // 128) * 128
    rel = base - jnp.repeat(wstart, G)
    rel = rel.reshape(n_tiles, G // SUBv, SUBv)
    words_i32 = jax.lax.bitcast_convert_type(words32, jnp.int32).reshape(1, -1)

    kernel = _gather_kernel(R, G, W, SUBv)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, G // SUBv, SUBv),
                         lambda t, ws: (t, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole stream words
        ],
        out_specs=pl.BlockSpec(
            (1, G // SUBv, SUBv, W),
            lambda t, ws: (t, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM),
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles, G // SUBv, SUBv, W), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(wstart, rel, words_i32)
    return jax.lax.bitcast_convert_type(out, jnp.uint32).reshape(ngroups, W)


@functools.partial(jax.jit, static_argnames=("n_words", "G", "W", "R", "interpret", "sub"))
def place_slabs(slab, base, n_words: int, G: int, W: int, R: int,
                interpret: bool = False, sub: int = SUB):
    """slab (ngroups, W) u32, base (ngroups,) i32 sorted -> (1, n_words + R).

    ngroups must be a multiple of G (pad with zero slabs at the last base).
    Words past the stream total are unspecified; callers slice by total bits.
    """
    ngroups = slab.shape[0]
    n_tiles = ngroups // G
    wstart = (base[::G] // 128) * 128  # aligned window starts
    rel = base - jnp.repeat(wstart, G)

    SUB = sub
    slab = jax.lax.bitcast_convert_type(slab, jnp.int32)
    n_rows = G // SUB
    rel = rel.reshape(n_tiles, n_rows, SUB)
    slab = slab.reshape(n_tiles, n_rows, SUB, W)
    kernel = _placement_kernel(R, G, W, SUB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, G // SUB, SUB),
                         lambda t, ws: (t, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G // SUB, SUB, W),
                         lambda t, ws: (t, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SUB, R), jnp.int32),
        ],
    )
    # NB: Mosaic lowering rejects the i64 constants that x64 mode sneaks
    # into index-map transforms; the kernel itself is purely 32-bit, so
    # trace it with x64 disabled.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, n_words + R), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(wstart, rel, slab)
    return jax.lax.bitcast_convert_type(out, jnp.uint32)

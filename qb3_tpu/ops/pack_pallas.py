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

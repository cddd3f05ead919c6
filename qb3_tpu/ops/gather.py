"""Register-window gather via one-hot matmuls on the MXU.

The decode wavefront needs, per group, W consecutive u32 stream words
starting at an arbitrary (sorted) word offset.  Per-element gathers are
XLA:TPU's weak spot (~10ns each) and the masked-sum Pallas kernel does O(R)
vector work per gathered word.  The MXU formulation does it with two exact
int8 matmuls per tile of G groups:

  1. window build: row one-hot (n_tiles, nrows, total_rows) @ (total_rows,
     128-byte rows) pulls each tile's 128-aligned stream window — no gather.
  2. slab pick:    group one-hot (G, R) @ shifted windows (R, W*4 bytes)
     picks each group's W words, byte-split so the int8 products are exact
     (one 1 per one-hot row; the int32 accumulator sees a single byte).

All operands are int8/uint8 bitcasts, so both matmuls run on the MXU's
integer path at full rate; everything else is static reshapes/slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("G", "W", "R", "row_matmul"))
def gather_slabs_onehot(words32, base, G: int, W: int, R: int,
                        row_matmul: bool = True):
    """words32 (n_words,) u32 (n_words % 128 == 0), base (ngroups,) i32
    sorted word offsets -> (ngroups, W) u32 with out[g, j] = words32[base[g]+j].

    ngroups must be a multiple of G; R (multiple of 128) must cover a tile's
    word span plus W slack.  Out-of-window offsets yield zeros.
    """
    ngroups = base.shape[0]
    n_tiles = ngroups // G
    nrows = R // 128 + 1  # +1 row of slack for the W-shifted windows
    base = base.astype(jnp.int32)
    wrow = base[::G] >> 7  # 128-aligned window start rows
    rel = base.reshape(n_tiles, G) - (wrow[:, None] << 7)  # (n_tiles, G)

    wpad = (-words32.shape[0]) % 128  # tiny streams: pad to whole rows
    if wpad:
        words32 = jnp.concatenate(
            [words32, jnp.zeros(wpad, words32.dtype)])
    words2d = words32.reshape(-1, 128)
    total_rows = words2d.shape[0]
    row_idx = wrow[:, None] + jnp.arange(nrows, dtype=jnp.int32)[None, :]
    if row_matmul:
        # (n_tiles*nrows, total_rows) one-hot @ (total_rows, 512 bytes)
        rows1h = (row_idx.reshape(-1, 1) ==
                  jnp.arange(total_rows, dtype=jnp.int32)[None, :])
        wbytes = jax.lax.bitcast_convert_type(words2d, jnp.uint8).reshape(
            total_rows, 512)
        win = jax.lax.dot_general(
            rows1h.astype(jnp.int8), wbytes.astype(jnp.int8),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        win = jax.lax.bitcast_convert_type(
            win.astype(jnp.uint8).reshape(n_tiles, nrows, 128, 4),
            jnp.uint32).reshape(n_tiles, nrows * 128)
    else:
        win = words2d[jnp.clip(row_idx, 0, total_rows - 1)]
        win = win.reshape(n_tiles, nrows * 128)

    # shifted windows: winsh[t, r, j] = win[t, r + j]
    winsh = jnp.stack([win[:, j : j + R] for j in range(W)], axis=-1)
    wsb = jax.lax.bitcast_convert_type(winsh, jnp.uint8).reshape(
        n_tiles, R, W * 4)
    onehot = (rel[:, :, None] == jnp.arange(R, dtype=jnp.int32)[None, None, :])
    out = jax.lax.dot_general(
        onehot.astype(jnp.int8), wsb.astype(jnp.int8),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32)
    out = jax.lax.bitcast_convert_type(
        out.astype(jnp.uint8).reshape(n_tiles, G, W, 4), jnp.uint32)
    return out.reshape(ngroups, W)


@functools.partial(jax.jit, static_argnames=("G", "W", "R", "level0"))
def gather_slabs_onehot8(words32, base, G: int, W: int, R: int,
                         level0: str | None = None):
    """Two-level variant of gather_slabs_onehot: the slab-pick matmul works
    on 8-word-aligned chunks, then a tiny 8-way select realigns to the exact
    word phase.

    The direct formulation replicates the tile window W times (winsh is
    (R, W*4) bytes); at wide-type register counts (u64: W=36) that
    materialized-window traffic dominates decode.  Chunking at 8 words cuts
    the replication to ceil((7+W)/8)+1 chunks (u64: 6) — the matmul gathers
    48 aligned words per group and the final (ngroups, W) slab is selected
    from them by the 3-bit phase, fully fused elementwise.
    """
    ngroups = base.shape[0]
    n_tiles = ngroups // G
    nch = (7 + W + 7) // 8  # 8-word chunks covering any phase + W words
    nrows = R // 128 + 1
    base = base.astype(jnp.int32)
    wrow = base[::G] >> 7
    rel = base.reshape(n_tiles, G) - (wrow[:, None] << 7)

    if level0 is None:  # the DMA kernel needs the TPU backend
        level0 = "dma" if jax.default_backend() == "tpu" else "matmul"
    if level0 == "dma":
        from .pack_pallas import extract_windows

        win = extract_windows(words32, wrow, nrows * 128)
    else:
        wpad = (-words32.shape[0]) % 128
        if wpad:
            words32 = jnp.concatenate(
                [words32, jnp.zeros(wpad, words32.dtype)])
        words2d = words32.reshape(-1, 128)
        total_rows = words2d.shape[0]
        row_idx = wrow[:, None] + jnp.arange(nrows, dtype=jnp.int32)[None, :]
        if level0 == "matmul":
            rows1h = (row_idx.reshape(-1, 1) ==
                      jnp.arange(total_rows, dtype=jnp.int32)[None, :])
            wbytes = jax.lax.bitcast_convert_type(words2d, jnp.uint8).reshape(
                total_rows, 512)
            win = jax.lax.dot_general(
                rows1h.astype(jnp.int8), wbytes.astype(jnp.int8),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            win = jax.lax.bitcast_convert_type(
                win.astype(jnp.uint8).reshape(n_tiles, nrows, 128, 4),
                jnp.uint32).reshape(n_tiles, nrows * 128)
        else:
            win = words2d[jnp.clip(row_idx, 0, total_rows - 1)]
            win = win.reshape(n_tiles, nrows * 128)

    R8 = R // 8
    win8 = win.reshape(n_tiles, nrows * 16, 8)
    # winsh8[t, r8, c] = win8[t, r8 + c]; replication factor nch, not W
    winsh8 = jnp.stack([win8[:, c : c + R8] for c in range(nch)], axis=2)
    wsb = jax.lax.bitcast_convert_type(winsh8, jnp.uint8).reshape(
        n_tiles, R8, nch * 32)
    onehot = ((rel >> 3)[:, :, None] ==
              jnp.arange(R8, dtype=jnp.int32)[None, None, :])
    out = jax.lax.dot_general(
        onehot.astype(jnp.int8), wsb.astype(jnp.int8),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32)
    out48 = jax.lax.bitcast_convert_type(
        out.astype(jnp.uint8).reshape(n_tiles, G, nch * 8, 4),
        jnp.uint32).reshape(ngroups, nch * 8)
    # realign: out[g, j] = out48[g, (base & 7) + j]
    ph = (rel & 7).reshape(-1)
    outs = []
    for j in range(W):
        acc = out48[:, j]
        for p in range(1, 8):
            acc = jnp.where(ph == p, out48[:, j + p], acc)
        outs.append(acc)
    return jnp.stack(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("n_words", "G", "W", "R"))
def place_slabs_onehot(slab, base, n_words: int, G: int, W: int, R: int):
    """Scatter-side dual of gather_slabs_onehot: per-group W-word slabs ->
    one bit-dense stream, as exact int8 one-hot matmuls on the MXU.

    slab (ngroups, W) u32 (per-group stream words, pre-shifted to bit
    phase, overlapping only on disjoint bits); base (ngroups,) i32 sorted
    word offsets; R (multiple of 128) covers any tile's span plus W+128
    slack.  Exactness: contributions to one byte have disjoint bits, so at
    most one carries bit 7 — int8 sums reassemble to the exact OR.

    Returns (1, n_out) u32 with n_out = ceil(n_words/128)*128.
    """
    ngroups = slab.shape[0]
    n_tiles = ngroups // G
    base = base.astype(jnp.int32)
    wrow = base[::G] >> 7  # 128-aligned window start rows
    rel = base.reshape(n_tiles, G) - (wrow[:, None] << 7)

    onehot = (rel[:, :, None] == jnp.arange(R, dtype=jnp.int32)[None, None, :])
    sbytes = jax.lax.bitcast_convert_type(slab, jnp.uint8).reshape(
        n_tiles, G, W * 4)
    # M[t, r, j] = sum of slab bytes of groups whose offset is r
    M = jax.lax.dot_general(
        onehot.astype(jnp.int8), sbytes.astype(jnp.int8),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32)
    M = M.reshape(n_tiles, R, W, 4)
    # diagonal combine: window word r collects slab word j placed at r - j
    RW = R + 128  # W < 128 slack, keeps rows aligned
    acc = jnp.zeros((n_tiles, RW, 4), jnp.int32)
    for j in range(W):
        acc = acc.at[:, j : j + R].add(M[:, :, j])
    # assemble tiles into the output with a row one-hot matmul (tile
    # windows overlap across neighbors; bits stay disjoint)
    nrows = RW // 128
    total_rows = -(-n_words // 128)
    row_idx = (wrow[:, None] + jnp.arange(nrows, dtype=jnp.int32)[None, :]
               ).reshape(-1)
    rows1h = (row_idx[:, None] ==
              jnp.arange(total_rows, dtype=jnp.int32)[None, :])
    wrows = acc.reshape(n_tiles * nrows, 128 * 4).astype(jnp.int8)
    out = jax.lax.dot_general(
        rows1h.astype(jnp.int8), wrows,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    out = jax.lax.bitcast_convert_type(
        out.astype(jnp.uint8).reshape(total_rows, 128, 4), jnp.uint32)
    return out.reshape(1, total_rows * 128)


def window_R_bytes(glens: np.ndarray, G: int, W: int) -> int:
    """Static window word count covering every tile's span (host side)."""
    bits = np.concatenate([[0], np.cumsum(glens.astype(np.int64))])
    starts = bits[:-1:G] // 32
    spans = np.diff(np.concatenate([starts, [bits[-1] // 32 + 1]]))
    R = int(spans.max()) + W + 130
    return max(128, -(-R // 128) * 128)

"""Phase B: parallel variable-length bit packing.

Replaces the serial oBits writer (bitstream.h:66-126).  Every symbol's
absolute bit position is the exclusive prefix sum of the symbol lengths;
each symbol then contributes to at most two 32-bit output words per 32-bit
chunk of its code.  Contributions of different symbols touch disjoint bits,
so a scatter-add over uint32 words reproduces the serial stream exactly
(sum == or when bit ranges are disjoint).

The stream is little-endian at bit level: bit position p lives in byte p>>3
at weight 1<<(p&7); uint32 words view as 4 little-endian bytes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_M32 = jnp.uint64(0xFFFFFFFF)


def pack_symbols(codes, lens, n_words: int):
    """Pack a symbol stream into uint32 words.

    codes: (n,) uint64, each < 2**lens[i]; lens: (n,) int32 in [0, 64].
    n_words: static output word count (must bound total bits / 32 + 1).
    Returns (words uint32 (n_words,), total_bits int64 scalar).
    """
    lens64 = lens.astype(jnp.int64)
    ends = jnp.cumsum(lens64)
    total = ends[-1] if lens.shape[0] else jnp.int64(0)
    offs = ends - lens64  # exclusive prefix sum

    words = jnp.zeros((n_words,), dtype=jnp.uint32)
    for k in (0, 1):  # 32-bit chunks of the code
        c = (codes >> jnp.uint64(32 * k)) & _M32
        o = offs + 32 * k
        live = lens > 32 * k
        w = jnp.where(live, (o >> 5).astype(jnp.int32), 0)
        s = jnp.where(live, o & 31, 0).astype(jnp.uint64)
        t = jnp.where(live, c << s, 0)
        words = words.at[w].add((t & _M32).astype(jnp.uint32), mode="drop")
        words = words.at[w + 1].add((t >> jnp.uint64(32)).astype(jnp.uint32), mode="drop")
    return words, total


def words_to_bytes(words: np.ndarray, total_bits: int) -> bytes:
    """Host-side: uint32 words -> the byte stream (padded to a whole byte)."""
    nbytes = (int(total_bits) + 7) // 8
    raw = np.ascontiguousarray(words)
    if raw.dtype.byteorder == ">":
        raw = raw.byteswap()
    return raw.view(np.uint8)[:nbytes].tobytes()

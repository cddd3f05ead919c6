"""Bit-granularity stream concatenation, vectorized.

QB3 payloads are bit-dense: appending one sub-stream after another lands at
arbitrary bit phase.  Each part is concatenated with two vectorized u64
shift/OR passes (O(words) numpy ops, no Python bigint), so multi-strip and
multi-shard assembly stays off the critical path.  reference analog: the
shared oBits accumulator across sub-encodes (QB3encode.cpp:405-455).
"""

from __future__ import annotations

import numpy as np


def _as_u64(words: np.ndarray, nbits: int) -> np.ndarray:
    """View any word array as little-endian u64 words, masked to nbits."""
    b = np.ascontiguousarray(words).view(np.uint8)
    nbytes = (nbits + 7) // 8
    nw = (nbits + 63) // 64
    buf = np.zeros(nw * 8, np.uint8)
    buf[:nbytes] = b[:nbytes]
    w = buf.view("<u8").copy()
    tail = nbits & 63
    if nw and tail:
        w[-1] &= np.uint64((1 << tail) - 1)
    return w


def stitch_words(parts) -> tuple[np.ndarray, int]:
    """parts: iterable of (words_array, nbits) -> (u64 words, total_bits).

    Bits of part k start at sum(nbits of parts < k); unused tail bits of the
    result are zero.
    """
    parts = [(w, int(n)) for w, n in parts]
    total = sum(n for _, n in parts)
    out = np.zeros(total // 64 + 2, np.uint64)
    off = 0
    for words, nbits in parts:
        if nbits == 0:
            continue
        w = _as_u64(words, nbits)
        base, s = off >> 6, off & 63
        nw = w.shape[0]
        if s == 0:
            out[base : base + nw] |= w
        else:
            s64 = np.uint64(s)
            out[base : base + nw] |= w << s64
            out[base + 1 : base + nw + 1] |= w >> np.uint64(64 - s)
        off += nbits
    return out, total


def stitch_bytes(parts) -> bytes:
    """stitch_words, returned as the payload byte string."""
    words, total = stitch_words(parts)
    return words.view(np.uint8)[: (total + 7) // 8].tobytes()

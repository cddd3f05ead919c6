"""RLE0 byte-level post-pass (QB3encode.cpp:271-332, QB3decode.cpp:267-307).

Escape scheme over the finished entropy stream:
  ff ff ff      -> two literal 0xff bytes
  ff ff n(!=ff) -> a run of 4+n zero bytes (n in 0..0xfe)
A zero run is only coded when >= 4 zeros follow and the previous emitted
byte was not 0xff; the final two input bytes are always literal.

This pass is inherently byte-serial; it runs on the host (a native helper
provides the fast path, with this as the portable fallback).
"""

from __future__ import annotations

import numpy as np

try:
    from . import native as _native
    _HAVE_NATIVE = _native.available()
except Exception:  # pragma: no cover - native helper optional
    _HAVE_NATIVE = False


def rle0_encode(data: bytes) -> bytes:
    if _HAVE_NATIVE:
        return _native.rle0_encode(data)
    return _rle0_encode_py(data)


def _rle0_encode_py(data: bytes) -> bytes:
    src = data
    n = len(src)
    out = bytearray()
    last = 0
    i = 0
    while i < n - 2:
        c = src[i]
        i += 1
        not_special = ((c + 1) & 0xFE) != 0
        if (
            not_special
            or c != src[i]
            or (c == 0 and (last == 0xFF or (n - i) < 3 or src[i + 1] or src[i + 2]))
        ):
            out.append(c)
            last = c
            continue
        i += 1  # consume the duplicate
        if c == 0:
            i += 2  # at least 4 zeros
            c = 0
            while c < 0xFE and i < n and src[i] == 0:
                c += 1
                i += 1
        last = 0
        out += b"\xff\xff"
        out.append(c)
    out += src[i:]
    return bytes(out)


def rle0_decode(data: bytes, expected: int) -> bytes:
    """Expand; raises on overflow past ``expected`` bytes (malicious input guard)."""
    if _HAVE_NATIVE:
        return _native.rle0_decode(data, expected)
    return _rle0_decode_py(data, expected)


def _rle0_decode_py(data: bytes, expected: int) -> bytes:
    src = data
    n = len(src)
    out = bytearray()
    i = 0
    while len(out) < expected and i < n - 2:
        c = src[i]
        i += 1
        if c != 0xFF or src[i] != 0xFF:
            out.append(c)
            continue
        if src[i + 1] != 0xFF:
            count = 4 + src[i + 1]
            fill = 0
        else:
            count = 2
            fill = 0xFF
        if len(out) + count > expected:
            raise ValueError("RLE0 output overflow")
        i += 2
        out += bytes([fill]) * count
    while i < n and len(out) < expected:
        out.append(src[i])
        i += 1
    if i != n or len(out) != expected:
        raise ValueError("RLE0 length mismatch")
    return bytes(out)


def rle0_decoded_size(data: bytes) -> int:
    """Size after expansion (QB3decode.cpp:294-307)."""
    if _HAVE_NATIVE:
        return _native.rle0_size(data)
    n = len(data)
    count = 0
    i = 0
    while i < n - 2:
        if data[i] != 0xFF or data[i + 1] != 0xFF:
            count += 1
            i += 1
            continue
        count += 2 if data[i + 2] == 0xFF else 4 + data[i + 2]
        i += 3
    return count + (n - i)

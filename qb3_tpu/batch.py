"""Batched multi-tile encode/decode: many same-shape rasters per dispatch.

The production shape for TPU serving (BASELINE config 4: tile pyramids,
8-band Landsat scenes): one kernel launch encodes/decodes a whole batch of
tiles, amortizing dispatch and keeping the chip busy.  Each tile is an
independent QB3 stream (fresh band state), identical to encoding it alone.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import container
from .api import DT_FROM_NP, NP_FROM_DT, UNSIGNED, default_cband, max_encoded_size
from .errors import QB3ShapeError
from .constants import B, HILBERT, B2, DType, Mode, ubits_for


@functools.lru_cache(maxsize=32)
def _batch_encode_kernel(n, shape, npdtype, order, cband, skipstep, n_words):
    from .ops.bitpack import group_bits_bound, pack_groups_auto
    from .ops.encode import encode_fast_blocks

    maxbits = group_bits_bound(np.dtype(npdtype).itemsize * 8, best=False)
    nb = shape[2]

    def one(img):
        zp = jnp.zeros(nb, dtype=img.dtype)
        zr = jnp.zeros(nb, dtype=jnp.int32)
        codes, lens, _, _ = encode_fast_blocks(img, zp, zr, order, cband, skipstep)
        words, total, glen = pack_groups_auto(codes, lens, n_words, maxbits)
        return words, total, glen

    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=32)
def _batch_decode_kernel(n, nblocks, nbands, h, w, order, cband, apply_step,
                         npdtype, n_words, R=None):
    from .api import _decode_kernel_indexed  # reuse the single-tile body
    from .constants import ubits_for
    from .ops.decode import (decode_groups, decode_groups_regwindow, indexed_meta,
                             reconstruct)

    out_dtype = np.dtype(npdtype)
    ubits = ubits_for(out_dtype.itemsize)
    tbits = out_dtype.itemsize * 8

    def one(words64, glens):
        if tbits <= 16:
            from .ops.decode import decode_indexed_narrow
            g = decode_indexed_narrow(words64, glens, nblocks, nbands,
                                      apply_step,
                                      jax.default_backend() == "tpu", tbits, R)
        else:
            kind, val_pos, vrung, cf = indexed_meta(words64, glens, nblocks,
                                                    nbands, ubits)
            g, _ = decode_groups(words64, kind, val_pos, vrung, cf,
                                 apply_step, has_extended=False)
        g = g.reshape(nblocks, nbands, B2)
        img, _ = reconstruct(g, jnp.zeros(nbands, jnp.uint64), h, w, nbands,
                             order, cband, out_dtype)
        return img

    return jax.jit(jax.vmap(one))


def encode_tiles(imgs: np.ndarray, mode: int = Mode.FTL, coreband=None,
                 index: bool = False) -> list[bytes]:
    """Encode (N, H, W, C) same-shape tiles in one dispatch -> N streams.

    FTL/BASE only (the batch path targets throughput serving); each tile's
    stream is byte-identical to a standalone encode.
    """
    if imgs.ndim != 4:
        raise QB3ShapeError("expected (N, H, W, C) tiles")
    n, h, w, nb = imgs.shape
    if mode not in (Mode.FTL, Mode.BASE_H, Mode.BASE_Z) or h < B or w < B:
        raise QB3ShapeError("batch encode supports FTL/BASE tiles >= 4x4")
    dt = DT_FROM_NP[imgs.dtype]
    cband = tuple(coreband) if coreband is not None else tuple(default_cband(nb))
    order = 0x0145236789CDABEF if mode == Mode.BASE_Z else HILBERT
    uns = imgs.view(UNSIGNED[imgs.dtype.itemsize])
    n_words = (max_encoded_size(w, h, nb, dt) + 3) // 4 + 2
    kern = _batch_encode_kernel(n, (h, w, nb), uns.dtype.name, order, cband,
                                mode == Mode.FTL, n_words)
    words, totals, glens = kern(jnp.asarray(uns))
    words = np.asarray(words)
    totals = np.asarray(totals)
    glens = np.asarray(glens)
    from .ops.bitpack import words_to_bytes
    out = []
    for i in range(n):
        idx = glens[i].astype("<u2").tobytes() if index else None
        hdr = container.write_headers(
            w, h, nb, dt, mode, list(cband), 1,
            0x0145236789CDABEF if mode == Mode.BASE_Z else 0, idx)
        out.append(hdr + words_to_bytes(words[i], int(totals[i])))
    return out


def decode_tiles(streams: list[bytes]) -> np.ndarray:
    """Decode N same-shape indexed FTL/BASE streams in one dispatch."""
    from .ops.decode import payload_words

    infos = [container.parse_headers(s) for s in streams]
    i0 = infos[0]
    if any((i.xsize, i.ysize, i.nbands, i.dtype, i.mode) !=
           (i0.xsize, i0.ysize, i0.nbands, i0.dtype, i0.mode) for i in infos):
        raise QB3ShapeError("batch decode requires same-shape streams")
    if any(i.index is None for i in infos):
        raise QB3ShapeError("batch decode needs the ix sidecar")
    h, w, nb = i0.ysize, i0.xsize, i0.nbands
    if h % B != 0 or w % B != 0:
        raise QB3ShapeError("batch decode requires 4-aligned tiles")
    np_dt = NP_FROM_DT[DType(i0.dtype)]
    uns_dt = UNSIGNED[np.dtype(np_dt).itemsize]
    nblocks = (h // B) * (w // B)
    order = i0.order or HILBERT

    wlists = [payload_words(s[i.data_offset:]) for s, i in zip(streams, infos)]
    n_words = 1 << max(4, int(np.ceil(np.log2(max(len(x) for x in wlists)))))
    wpad = np.zeros((len(streams), n_words), np.uint64)
    for j, x in enumerate(wlists):
        wpad[j, : len(x)] = x
    glens = np.stack([
        np.frombuffer(i.index, dtype="<u2").astype(np.int32) for i in infos])
    from .api import _indexed_window_R
    tb = np.dtype(uns_dt).itemsize * 8
    R = max(_indexed_window_R(g, tb) for g in glens) if tb <= 16 else None
    kern = _batch_decode_kernel(len(streams), nblocks, nb, h, w, order,
                                tuple(i0.cband), i0.mode != Mode.FTL,
                                np.dtype(uns_dt).name, n_words, R)
    out = np.asarray(kern(jnp.asarray(wpad), jnp.asarray(glens)))
    return out.view(np_dt)

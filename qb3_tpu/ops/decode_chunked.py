"""Self-contained parallel decode from the compact "ic" chunked index.

The full "ix" sidecar stores one u16 bit length per group (~19% of an 8-bit
stream).  The "ic" chunk instead anchors every K blocks: a u32 span (the
chunk's total bits) plus the per-band entry rung state — 4+nbands bytes per
K*nbands groups (~1% of the stream).  Decode then runs chunk-parallel: all
chunks walk their K blocks simultaneously; within a chunk the groups decode
sequentially with register-window bit reads, which is exactly the serial
dependency the reference decoder has (QB3decode.h:603-723) but carried by
thousands of vector lanes at once instead of one scalar cursor.

FTL/BASE streams only (no extended encodings), any dtype.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import B2
from .decode import _vlc_decode_arith, dsw_arith
from .bitutils import step_flip_index

# read once at import: toggling after first compile cannot retarget cached
# jitted kernels, so a live env read inside traces would silently disagree
_WAVE_ENV = os.environ.get("QB3_WAVE", "")

# static register-window sizes per element width: cover one group's worst
# span (prefix + 16 codes [+ overflow bits]) from any 32-bit phase
_NREG = {8: 7, 16: 11, 32: 20, 64: 36}
# values decoded per 64-bit window (per * max_code_bits <= 64)
_PER = {8: 6, 16: 3, 32: 1, 64: 1}

IC_DEFAULT_K = 8  # blocks per chunk: measured faster than 16, <2% sidecar
_IC_WIDE = 0x8000  # k_blocks flag: u32 spans (chunk spans can exceed 65535)


def pack_ic(spans: np.ndarray, entry: np.ndarray, k_blocks: int) -> bytes:
    """Serialize the "ic" chunk payload: u16le k_blocks (bit 15 set when the
    spans need u32), per-chunk u16le/u32le bit spans, then per-chunk
    per-band entry rung bytes."""
    wide = spans.size and int(spans.max()) > 0xFFFF
    head = int(k_blocks) | (_IC_WIDE if wide else 0)
    return (head.to_bytes(2, "little")
            + spans.astype("<u4" if wide else "<u2").tobytes()
            + entry.astype(np.uint8).tobytes())


def parse_ic(buf: bytes, nblocks: int, nbands: int):
    """Inverse of pack_ic -> (k_blocks, starts int64 (nchunks,),
    entry (nchunks, nbands) int32, total_bits), or None if inconsistent."""
    if len(buf) < 2:
        return None
    head = int.from_bytes(buf[:2], "little")
    k = head & ~_IC_WIDE
    wide = bool(head & _IC_WIDE)
    if k < 1:
        return None
    nchunks = -(-nblocks // k)
    sbytes = 4 if wide else 2
    if len(buf) != 2 + nchunks * (sbytes + nbands):
        return None
    spans = np.frombuffer(buf, dtype="<u4" if wide else "<u2",
                          count=nchunks, offset=2).astype(np.int64)
    entry = np.frombuffer(buf, dtype=np.uint8,
                          offset=2 + sbytes * nchunks).reshape(nchunks, nbands)
    ends = np.cumsum(spans)
    starts = ends - spans
    if ends[-1] >= 1 << 31:  # int32 bit cursors in the device walk
        return None
    return k, starts, entry.astype(np.int32), int(ends[-1])


def chunk_spans(glens: np.ndarray, rungs: np.ndarray, entry_runbits: np.ndarray,
                k_blocks: int):
    """Host-side "ic" payload pieces from the encoder's per-group lengths and
    per-block rung tensor.

    glens: (nblocks*nbands,) bit length per group in stream order;
    rungs: (nblocks, nbands) running runbits state AFTER each block;
    entry_runbits: (nbands,) state before the image.
    Returns (spans u32 (nchunks,), entry (nchunks, nbands) u8).
    """
    nblocks, nbands = rungs.shape
    nchunks = -(-nblocks // k_blocks)
    g = np.zeros(nchunks * k_blocks * nbands, np.int64)
    g[: glens.size] = glens
    spans = g.reshape(nchunks, -1).sum(axis=1).astype(np.uint32)
    entry = np.empty((nchunks, nbands), np.uint8)
    entry[0] = entry_runbits
    entry[1:] = rungs[k_blocks - 1 : (nchunks - 1) * k_blocks : k_blocks]
    return spans, entry


def decode_chunked_auto(words64, starts, entry_rungs, k_blocks: int,
                        nblocks: int, nbands: int, apply_step: bool,
                        tbits: int, maxw: int | None = None,
                        R: int | None = None, use_pallas: bool = False,
                        interpret: bool = False):
    """Dispatch the chunk walk: fused Pallas VMEM kernel for u8 on TPU
    (chunkwalk_pallas.py), else the XLA select-chain walk below.  The choice
    is an explicit cache-key parameter (not a live env read)."""
    if (use_pallas and tbits in (8, 16) and maxw is not None
            and _WAVE_ENV != "xla"):
        from .chunkwalk_pallas import chunkwalk8

        nchunks = starts.shape[0]
        g = chunkwalk8(words64, starts, entry_rungs, maxw, k_blocks, nbands,
                       apply_step, R=R, interpret=interpret,
                       ubits=3 if tbits == 8 else 4)
        return g.reshape(nchunks * k_blocks, nbands, B2)[:nblocks].reshape(
            nblocks * nbands, B2)
    return decode_chunked(words64, starts, entry_rungs, k_blocks, nblocks,
                          nbands, apply_step, tbits)


def decode_chunked(words64, starts, entry_rungs, k_blocks: int, nblocks: int,
                   nbands: int, apply_step: bool, tbits: int):
    """Chunk-parallel wavefront decode -> mag-sign groups (nblocks*nbands, B2).

    words64: padded stream words; starts: (nchunks,) int32 absolute bit
    offset of each chunk; entry_rungs: (nchunks, nbands) int32 runbits state
    at each chunk entry.  k_blocks/nblocks/nbands/tbits static.
    """
    ubits = {8: 3, 16: 4, 32: 5, 64: 6}[tbits]
    nmask = (1 << ubits) - 1
    lmask = (1 << (ubits + 1)) - 1
    NREG = _NREG[tbits]
    per = _PER[tbits]
    nchunks = starts.shape[0]

    words32 = jax.lax.bitcast_convert_type(words64, jnp.uint32).reshape(-1)
    n32 = words32.shape[0]

    def group_step(off, rung_band):
        """Decode one group per chunk lane at bit offsets `off` with incoming
        per-band runbits `rung_band`; returns (g, new_off, new_rung)."""
        base = jnp.clip(off >> 5, 0, n32 - NREG)
        regs_arr = words32[base[:, None] + jnp.arange(NREG)[None, :]]
        regs = [regs_arr[:, i] for i in range(NREG)]
        regs += [jnp.zeros_like(regs[0]), jnp.zeros_like(regs[0])]
        phase = off - (base << 5)  # == off & 31 except in the clipped tail

        def window(o):
            """64 stream bits at chunk-relative offset o (o in [0, 32*NREG))."""
            wi = o >> 5
            sh = (o & 31).astype(jnp.uint32)
            lo = regs[NREG - 1]
            hi = regs[NREG]
            for i in range(NREG - 2, -1, -1):
                lo = jnp.where(wi == i, regs[i], lo)
                hi = jnp.where(wi == i, regs[i + 1], hi)
            lo = lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << 32)
            # third word for the shifted high part
            w2 = regs[NREG]
            for i in range(NREG - 3, -1, -1):
                w2 = jnp.where(wi == i, regs[i + 2], w2)
            out = lo >> sh.astype(jnp.uint64)
            out = out | jnp.where(sh == 0, jnp.uint64(0),
                                  w2.astype(jnp.uint64) << ((jnp.uint64(64) - sh.astype(jnp.uint64)) & 63))
            return out

        # ---- codeswitch parse (QB3decode.h:613-618)
        w0 = window(phase)
        has_cs = (w0 & 1) == 1
        dlen, ddelta = dsw_arith(w0 >> 1, ubits)
        cs_len = jnp.where(has_cs, dlen, 1)
        delta = jnp.where(has_cs, ddelta, 0)
        rung = (rung_band + delta) & nmask
        rung0 = rung == 0
        flag = ((w0 >> cs_len.astype(jnp.uint64)) & 1).astype(jnp.int32)
        is_bits = rung0 & (flag == 1)
        is_group = ~rung0
        o = phase + cs_len + jnp.where(rung0, 1, 0)

        # ---- 16-value wavefront, `per` values per 64-bit window
        outs16 = []
        for v0 in range(0, B2, per):
            take = min(per, B2 - v0)
            w = window(o)
            shift = jnp.zeros_like(o)
            for t in range(take):
                ww = (w >> shift.astype(jnp.uint64))
                if tbits <= 16:
                    gv, gl = _vlc_decode_arith(ww.astype(jnp.uint32), rung, jnp.uint32)
                else:
                    gv, gl = _vlc_decode_arith(ww, rung, jnp.uint64)
                if tbits == 64:
                    # rung-63 long form: 65 bits, bit 62 of the value is the
                    # stream bit right after the 64-bit code part
                    ovf = gl == 65
                    extra = (window(o + shift + 64) & 1)
                    gv = gv | jnp.where(ovf & is_group, extra << 62, jnp.uint64(0))
                v = jnp.where(is_group, gv,
                              jnp.where(is_bits, (ww & 1).astype(gv.dtype), 0))
                ln = jnp.where(is_group, gl, jnp.where(is_bits, 1, 0))
                outs16.append(v)
                shift = shift + ln
            o = o + shift
        g = jnp.stack(outs16, axis=-1)  # (nchunks, B2)

        if apply_step:
            match, ones = step_flip_index(g, rung)
            lane = jnp.arange(B2, dtype=jnp.int32)
            do = is_group & match & (rung >= 1)
            flip = do[:, None] & (lane[None, :] == ones[:, None]) & (ones[:, None] < B2)
            g = g ^ (jnp.where(flip, 1, 0).astype(g.dtype) << rung[:, None].astype(g.dtype))
        return g, off + (o - phase), rung

    def block_step(carry, _):
        off, rungs = carry
        gs = []
        new_rungs = []
        for band in range(nbands):
            g, off, r = group_step(off, rungs[:, band])
            gs.append(g)
            new_rungs.append(r)
        rungs = jnp.stack(new_rungs, axis=1)
        return (off, rungs), jnp.stack(gs, axis=1)  # (nchunks, nbands, B2)

    (off, _), vals = jax.lax.scan(
        block_step, (starts.astype(jnp.int32), entry_rungs.astype(jnp.int32)),
        None, length=k_blocks)
    # (k_blocks, nchunks, nbands, B2) -> (nblocks, nbands, B2)
    g = jnp.moveaxis(vals, 0, 1).reshape(nchunks * k_blocks, nbands, B2)
    return g[:nblocks].reshape(nblocks * nbands, B2)

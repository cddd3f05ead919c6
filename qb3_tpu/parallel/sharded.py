"""Multi-chip QB3: tile-row sharding over a device mesh.

The reference is strictly single-threaded (SURVEY.md §2.11); extent scaling
is the TPU-native axis the reference lacks.  The image is sharded in
block-row-aligned strips over a 1-D mesh.  The serial band state at strip
boundaries is *data-defined*, so it needs no sequential chain:

  * entry_prev  = the last scanned (band-decorrelated) value of the previous
    strip — a pure function of that strip's pixels, exchanged with one
    ppermute;
  * entry_runbits = the rung of the previous strip's last block — local to
    that strip once its own entry_prev arrived, one more ppermute.

Each device then runs the ordinary phase A/B on its strip; per-strip bit
lengths are all-gathered and the host (or a follow-up device pass) stitches
the strips into one valid stream by bit-shifting — producing the byte-exact
serial stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import B, HILBERT, ubits_for
from ..ops.bitpack import group_bits_bound, pack_groups
from ..ops.encode import block_rungs, delta_mags, fast_symbols, gather_blocks


def _shard_encode_fn(order, cband, skipstep, ubits, n_words, axis, maxbits):
    def fn(img_local):
        # phase A needs the neighbor's exit state; both exchanges are pure
        # functions of local pixels (no sequential chain across devices)
        vals = gather_blocks(img_local, order, cband)
        n_dev = jax.lax.axis_size(axis)
        perm = [(i, i + 1) for i in range(n_dev - 1)]
        exit_val = vals[-1, :, -1]  # (C,) last scanned value of this strip
        entry_prev = jax.lax.ppermute(exit_val, axis, perm)
        m, _ = delta_mags(vals, entry_prev)
        bitsused, rung, _, exit_runbits = block_rungs(
            m, jnp.zeros(vals.shape[1], jnp.int32))
        entry_runbits = jax.lax.ppermute(exit_runbits, axis, perm)
        oldrung = jnp.concatenate([entry_runbits[None, :], rung[:-1]], axis=0)
        codes, lens = fast_symbols(m, bitsused, rung, oldrung, ubits, skipstep)
        nsym = codes.shape[-1]
        words, total, _glen = pack_groups(codes.reshape(-1, nsym), lens.reshape(-1, nsym),
                                          n_words, maxbits)
        return words[None], total[None]

    return fn


@functools.lru_cache(maxsize=16)
def _sharded_kernel(shape, npdtype, order, cband, skipstep, n_words, n_dev):
    if len(jax.devices()) < n_dev:
        raise RuntimeError(
            f"need {n_dev} devices, have {len(jax.devices())} "
            "(set --xla_force_host_platform_device_count for CPU testing)")
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("tiles",))
    ubits = ubits_for(np.dtype(npdtype).itemsize)
    maxbits = group_bits_bound(np.dtype(npdtype).itemsize * 8, best=False)
    fn = _shard_encode_fn(order, cband, skipstep, ubits, n_words, "tiles", maxbits)
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=P("tiles"),
        out_specs=(P("tiles"), P("tiles")),
    )
    return jax.jit(mapped), mesh


def encode_fast_sharded(img: np.ndarray, n_dev: int, order: int = HILBERT,
                        cband: tuple[int, ...] | None = None,
                        skipstep: bool = True):
    """Encode (H, W, C) across n_dev devices; H must be a multiple of 4*n_dev.

    Returns (payload bytes, per-shard bit lengths) — byte-exact with the
    single-device stream.
    """
    h, w, nb = img.shape
    assert h % (B * n_dev) == 0, "height must split into whole block rows"
    if cband is None:
        cband = tuple(range(nb))
    from ..api import max_encoded_size, DT_FROM_NP
    n_words = (max_encoded_size(w, h // n_dev, nb, DT_FROM_NP[img.dtype]) + 3) // 4 + 2
    kern, mesh = _sharded_kernel((h, w, nb), img.dtype.name, order, tuple(cband),
                                 skipstep, n_words, n_dev)
    arr = jax.device_put(jnp.asarray(img), NamedSharding(mesh, P("tiles")))
    words, totals = kern(arr)
    return stitch_streams(np.asarray(words), np.asarray(totals))


def stitch_streams(words: np.ndarray, totals: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Concatenate per-shard bitstreams at bit granularity.

    words: (n_shards, n_words) uint32; totals: (n_shards,) bit lengths.
    """
    out = bytearray()
    acc = 0  # pending bits (int) and count
    accn = 0
    for s in range(words.shape[0]):
        nbits = int(totals[s])
        nbytes = (nbits + 7) // 8
        chunk = words[s].view(np.uint8)[:nbytes].tobytes()
        val = int.from_bytes(chunk, "little") & ((1 << nbits) - 1)
        acc |= val << accn
        accn += nbits
        emit = accn // 8
        out += (acc & ((1 << (emit * 8)) - 1)).to_bytes(emit, "little")
        acc >>= emit * 8
        accn -= emit * 8
    if accn:
        out += bytes([acc & 0xFF])
    return bytes(out), totals

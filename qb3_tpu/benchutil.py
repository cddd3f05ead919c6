"""Timing helpers with guaranteed device synchronization.

On relay-tunneled platforms (axon), ``jax.block_until_ready`` can return as
soon as the dispatch is acknowledged, long before the computation finishes —
timings taken that way measure enqueue latency, not compute.  The only
reliable barrier is a device-to-host fetch.  But the relay's D2H path is
slow (~20 MB/s measured), so fetching any real output leaf poisons the
timing with transfer cost.  The barrier therefore reduces the last queued
output to ONE scalar on device (a jitted sum over every leaf — in-order
execution then guarantees every earlier queued call has finished) and
fetches only that.

All bench/profiling code must use :func:`sustained` (or :func:`sync`) from
here rather than ``block_until_ready``.
"""

from __future__ import annotations

import time

import numpy as np

_probe_cache = {}


def _probe_fn():
    import jax
    import jax.numpy as jnp

    if "fn" not in _probe_cache:
        def reduce_tree(tree):
            leaves = [x for x in jax.tree_util.tree_leaves(tree)
                      if hasattr(x, "dtype")]
            acc = jnp.zeros((), jnp.float32)
            for x in leaves:
                acc = acc + jnp.sum(x, dtype=jnp.float32)
            return acc

        _probe_cache["fn"] = jax.jit(reduce_tree)
    return _probe_cache["fn"]


def sync(tree) -> None:
    """Hard barrier: device-side scalar reduction of ``tree``, tiny fetch.

    Only jax.Array leaves participate: host results (bytes, numpy arrays)
    are complete by construction, and feeding them to the probe would time
    an H2D transfer instead."""
    import jax

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if isinstance(x, jax.Array)]
    if not leaves:
        return
    np.asarray(_probe_fn()(leaves))


def sustained(fn, iters: int = 30) -> float:
    """Sustained seconds/call: queue ``iters`` calls (device pipelining
    stays enabled), then barrier once on the last result.  The single
    trailing scalar reduction+fetch is amortized across ``iters`` and
    biases the result slightly slow — the honest direction."""
    sync(fn())  # warmup/compile (incl. the probe for this output tree)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters


def sustained_stats(fn, iters: int = 30, windows: int = 3):
    """(mean seconds/call, relative sigma) across ``windows`` independent
    timing windows — the sigma records run-to-run noise on the relay
    platform so matrix rows carry their own error bar.

    Each window runs the FULL ``iters`` so the one trailing barrier is
    amortized identically to :func:`sustained`.  The round-5 variance
    study (doc/DESIGN.md "variance: solved") showed the barrier round trip
    costs ~20-75 ms with heavy jitter: at 20 iters/window a ~1 ms kernel
    reads >2x slow with ~9% sigma; at >=100 iters/window the same kernel
    converges to its true rate with <2% sigma.  Short-kernel callers must
    size ``iters`` so iters * t_kernel >> 100 ms."""
    sync(fn())
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        sync(outs[-1])
        ts.append((time.perf_counter() - t0) / iters)
    mean = float(np.mean(ts))
    return mean, float(np.std(ts) / mean) if mean else 0.0

"""Timing helpers with guaranteed device synchronization.

On relay-tunneled platforms (axon), ``jax.block_until_ready`` can return as
soon as the dispatch is acknowledged, long before the computation finishes —
timings taken that way measure enqueue latency, not compute.  The only
reliable barrier is a device-to-host fetch: single-device XLA executes
enqueued computations in order, so fetching any leaf of the *last* queued
result completes only after every earlier call has finished.

All bench/profiling code must use :func:`sustained` (or :func:`sync`) from
here rather than ``block_until_ready``.
"""

from __future__ import annotations

import time

import numpy as np


def sync(tree) -> None:
    """Hard barrier: fetch the smallest array leaf of ``tree`` to host."""
    import jax

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "nbytes")]
    if not leaves:
        return
    small = min(leaves, key=lambda x: x.nbytes)
    np.asarray(small)


def sustained(fn, iters: int = 30) -> float:
    """Sustained seconds/call: queue ``iters`` calls (device pipelining
    stays enabled), then barrier once on the last result.  The single
    trailing fetch (~ms) is amortized across ``iters`` and biases the
    result slightly slow — the honest direction."""
    sync(fn())  # warmup/compile
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters

"""Shared on-chip timing helper for benchmark probes.

Through the axon relay, `jax.block_until_ready` can return before the
computation finishes (lazy allocation; see .claude/skills/verify) —
probes that trusted it have recorded dispatch floors (40 µs) for
multi-ms kernels. The only reliable completion barrier is a host
READBACK of (a slice of) the result. A readback costs a tunnel round
trip (~28 ms), so it must sit outside the per-iteration loop and be
subtracted: we time n dispatches + one readback, then measure the
readback alone on an empty queue and subtract it.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def force(r) -> float:
    """Host readback of one element of (the first leaf of) r — the
    reliable completion barrier through the relay."""
    leaf = [x for x in jax.tree_util.tree_leaves(r)
            if hasattr(x, "ravel")][0]
    return float(jnp.asarray(leaf).ravel()[:1].sum())


def timeit_ms(fn, *args, n: int = 30, warm: int = 3) -> float:
    """Median-free simple mean over n dispatches with readback-corrected
    completion. Returns milliseconds per call."""
    r = None
    for _ in range(warm):
        r = fn(*args)
    force(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    force(r)
    t1 = time.perf_counter()
    # readback cost on an empty queue (the tunnel round trip)
    t2 = time.perf_counter()
    force(r)
    rt = time.perf_counter() - t2
    return max((t1 - t0) - rt, 0.0) / n * 1e3

"""Honest device timing.

On the axon relay backend, ``jax.block_until_ready`` returns before the
computation actually finishes (completion is only signaled on data
readback), so naive timings over-report throughput by orders of
magnitude. ``timeit`` forces a tiny scalar readback per iteration, which
synchronizes on true completion while keeping transfer cost negligible.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _sync(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    s = sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves)
    return float(s)  # host readback == real completion barrier


def timeit(fn, *args, iters: int = 5, warmup: int = 1, **kwargs):
    """-> (seconds_per_call, last_sync_value). fn must be jit-compiled or
    cheap to trace."""
    for _ in range(warmup):
        _sync(fn(*args, **kwargs))
    t0 = time.time()
    for _ in range(iters):
        v = _sync(fn(*args, **kwargs))
    return (time.time() - t0) / iters, v

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


def timeit(fn, *args, iters: int = 5, warmup: int = 2, repeats: int = 3,
           **kwargs):
    """-> (median_seconds_per_call, last_sync_value).

    ``repeats`` independent timed blocks of ``iters`` calls each; the
    MEDIAN block time is reported so one host-contention hiccup (the
    round-2 scoreboard collapse: 164x measured, 48x recorded on
    identical code) cannot poison the headline number.
    """
    for _ in range(warmup):
        _sync(fn(*args, **kwargs))
    times = []
    for _ in range(max(1, repeats)):
        t0 = time.time()
        for _ in range(iters):
            v = _sync(fn(*args, **kwargs))
        times.append((time.time() - t0) / iters)
    times.sort()
    return times[len(times) // 2], v

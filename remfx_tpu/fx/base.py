"""Effect framework: pure-function effects + randomized wrappers.

Every effect is a pair of pure functions

    sample_params(key, ranges)        -> params   (dict of traced scalars)
    render(x, params, sample_rate)    -> y        (jit/vmap-able)

mirroring the reference's per-call parameter sampling (reference
remfx/effects.py:29-34 — each ``forward`` draws fresh random parameters,
then renders). ``RandomEffect`` packages the two with the class-default
ranges so the data pipeline can be driven exactly like the reference's
``RandomPedalboard*`` modules, but on-device and batchable.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def uniform(key, lo, hi):
    """U[lo, hi) — reference ``rand`` (remfx/effects.py:29-30)."""
    return jax.random.uniform(key, (), jnp.float32, lo, hi)


def loguniform(key, lo, hi):
    """Log-uniform — reference ``loguniform`` (scipy.stats.loguniform)."""
    u = jax.random.uniform(key, (), jnp.float32)
    return jnp.exp(jnp.log(lo) + u * (jnp.log(hi) - jnp.log(lo)))


def randint(key, lo, hi):
    """Uniform integer in [lo, hi] inclusive — reference ``randint``."""
    return jax.random.randint(key, (), lo, hi + 1)


class RandomEffect:
    """A randomized effect: samples fresh params per call, then renders.

    ``render_fn(x, params, sample_rate)`` must be jittable; ``sampler(key,
    sample_rate, ranges) -> params``. ``ranges`` holds the static min/max
    config (overridable like the reference's cfg/effects/all.yaml).
    """

    name: str

    def __init__(
        self,
        name: str,
        sample_rate: float,
        sampler: Callable,
        render_fn: Callable,
        ranges: dict,
        batch_render_fn: Callable | None = None,
    ):
        self.name = name
        self.sample_rate = sample_rate
        self.sampler = sampler
        self.render_fn = render_fn
        self.ranges = dict(ranges)
        # optional natively-batched renderer (xb (B,C,T), params (B,...))
        # — used when vmap would under-utilize a kernel (e.g. the Pallas
        # envelope follower wants the whole batch on the VPU lanes)
        self.batch_render_fn = batch_render_fn

    def sample_params(self, key):
        return self.sampler(key, self.sample_rate, self.ranges)

    def render(self, x, params):
        return self.render_fn(x, params, self.sample_rate)

    def __call__(self, key, x):
        """Sample params and render — the reference's ``forward``."""
        return self.render(x, self.sample_params(key))

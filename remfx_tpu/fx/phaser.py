"""Phaser — JUCE ``dsp::Phaser``-style (6 modulated first-order allpasses).

Parity target: pedalboard ``Phaser``, reference ``RandomPedalboardPhaser``
(remfx/effects.py:418-465 — note the reference's own bug: centre
frequency is drawn as ``rand(min, min)`` i.e. constant; we preserve that
at the wrapper level). Implementation is a documented approximation of
the JUCE topology (exact JUCE coefficient update cadence differs):

    lfo[n] = sin(2π rate n / sr)
    fc[n]  = exp-map of (norm(centre) + 0.5*depth*lfo[n]) over [20, 0.49 sr]
    a[n]   = (tan(π fc/sr) - 1) / (tan(π fc/sr) + 1)
    6 series allpasses y = a*u + u' - a*y'; feedback from last stage;
    linear dry/wet mix.

This effect is outside the core five (chain probability 0.01 in the
reference mixing channel) — a ``lax.scan`` over time is acceptable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.fx.base import RandomEffect, uniform

DEFAULT_RANGES = {
    "min_rate_hz": 0.25,
    "max_rate_hz": 5.0,
    "min_depth": 0.1,
    "max_depth": 0.6,
    "min_centre_frequency_hz": 200.0,
    "max_centre_frequency_hz": 600.0,
    "min_feedback": 0.1,
    "max_feedback": 0.6,
    "min_mix": 0.1,
    "max_mix": 0.7,
}

N_STAGES = 6


def sample_params(key, sample_rate, ranges):
    ks = jax.random.split(key, 5)
    return {
        "rate_hz": uniform(ks[0], ranges["min_rate_hz"], ranges["max_rate_hz"]),
        "depth": uniform(ks[1], ranges["min_depth"], ranges["max_depth"]),
        # reference bug preserved: rand(min, min) == constant min
        "centre_frequency_hz": uniform(
            ks[2],
            ranges["min_centre_frequency_hz"],
            ranges["min_centre_frequency_hz"],
        ),
        "feedback": uniform(ks[3], ranges["min_feedback"], ranges["max_feedback"]),
        "mix": uniform(ks[4], ranges["min_mix"], ranges["max_mix"]),
    }


@partial(jax.jit, static_argnames=("sample_rate",))
def _render(x, rate_hz, depth, centre_hz, feedback, mix, sample_rate):
    C, T = x.shape
    f_lo, f_hi = 20.0, 0.49 * sample_rate
    n = jnp.arange(T, dtype=jnp.float32)
    lfo = jnp.sin(2.0 * np.pi * rate_hz * n / sample_rate)
    norm_centre = jnp.log(centre_hz / f_lo) / np.log(f_hi / f_lo)
    norm = jnp.clip(norm_centre + 0.5 * depth * lfo, 0.0, 1.0)
    fc = f_lo * jnp.exp(norm * np.log(f_hi / f_lo))
    tant = jnp.tan(np.pi * fc / sample_rate)
    a_t = (tant - 1.0) / (tant + 1.0)  # (T,)

    xt = jnp.moveaxis(x, -1, 0)  # (T, C)

    def step(state, inp):
        xs, ys, last_out = state  # xs/ys: (N_STAGES, C)
        xn, a = inp
        u = xn + feedback * last_out
        new_xs = []
        new_ys = []
        for s in range(N_STAGES):
            y = a * u + xs[s] - a * ys[s]
            new_xs.append(u)
            new_ys.append(y)
            u = y
        state = (jnp.stack(new_xs), jnp.stack(new_ys), u)
        return state, u

    init = (
        jnp.zeros((N_STAGES, C), x.dtype),
        jnp.zeros((N_STAGES, C), x.dtype),
        jnp.zeros((C,), x.dtype),
    )
    _, wet = jax.lax.scan(step, init, (xt, a_t))
    wet = jnp.moveaxis(wet, 0, -1)
    return ((1.0 - mix) * x + mix * wet).astype(x.dtype)


def render(x, params, sample_rate):
    return _render(
        x,
        params["rate_hz"],
        params["depth"],
        params["centre_frequency_hz"],
        params["feedback"],
        params["mix"],
        int(sample_rate),
    )


def make(sample_rate, **overrides) -> RandomEffect:
    ranges = {**DEFAULT_RANGES, **overrides}
    return RandomEffect("phaser", sample_rate, sample_params, render, ranges)

"""Chorus — JUCE ``dsp::Chorus`` semantics (time-varying fractional delay).

Parity target: pedalboard ``Chorus``, reference ``RandomPedalboardChorus``
(remfx/effects.py:370-415). Per sample (shared sine LFO across channels):

    delay[n] = max(1 + 0.5*depth*sin(2π rate n/sr), 0) * centre_ms/1000*sr
    u[n]     = x[n] - feedback * y[n-1]          (negative feedback in)
    y[n]     = (1-f)*u[n-Di] + f*u[n-Di-1]       (linear-interp pop)
    out[n]   = (1-mix)*x[n] + mix*y[n]           (linear dry/wet)

The modulated delay makes this time-varying (no FFT shortcut), but the
minimum possible delay over the configured ranges lower-bounds the
feedback lag, so we process in static chunks of W < min_delay samples:
within a chunk every pop reads only previous-chunk data, making the
chunk fully vectorizable; chunks run under ``lax.fori_loop``
(T/W ≈ 2k sequential steps of 128-wide work instead of 262k scalar steps).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.fx.base import RandomEffect, uniform

DEFAULT_RANGES = {
    "min_rate_hz": 0.25,
    "max_rate_hz": 4.0,
    "min_depth": 0.0,
    "max_depth": 0.6,
    "min_centre_delay_ms": 5.0,
    "max_centre_delay_ms": 10.0,
    "min_feedback": 0.1,
    "max_feedback": 0.6,
    "min_mix": 0.1,
    "max_mix": 0.7,
}


def sample_params(key, sample_rate, ranges):
    ks = jax.random.split(key, 5)
    return {
        "rate_hz": uniform(ks[0], ranges["min_rate_hz"], ranges["max_rate_hz"]),
        "depth": uniform(ks[1], ranges["min_depth"], ranges["max_depth"]),
        "centre_delay_ms": uniform(
            ks[2], ranges["min_centre_delay_ms"], ranges["max_centre_delay_ms"]
        ),
        "feedback": uniform(ks[3], ranges["min_feedback"], ranges["max_feedback"]),
        "mix": uniform(ks[4], ranges["min_mix"], ranges["max_mix"]),
    }


def chunk_size(ranges, sample_rate) -> int:
    """Largest power-of-two chunk strictly below the minimum possible delay.

    The chunked renderer is only correct when every tap reads data from a
    PREVIOUS chunk, i.e. floor(delay) >= W at the LFO trough — so the
    bound must use the true worst-case factor 1 - 0.5*max_depth (no
    floor): ranges where it reaches ~0 must be rejected, not silently
    rendered with stale-zero taps."""
    min_delay_ms = ranges["min_centre_delay_ms"] * max(
        1.0 - 0.5 * ranges["max_depth"], 0.0
    )
    min_delay = min_delay_ms / 1000.0 * sample_rate
    w = 1
    while w * 2 < min_delay and w < 512:
        w *= 2
    if w < 8:
        raise ValueError(
            f"chorus ranges give min delay {min_delay:.1f} samples; too small "
            "for chunked rendering"
        )
    return w


@partial(jax.jit, static_argnames=("sample_rate", "W"))
def _render(x, rate_hz, depth, centre_delay_ms, feedback, mix, sample_rate, W):
    C, T = x.shape
    n_chunks = -(-T // W)
    Tp = n_chunks * W
    xp = jnp.pad(x, [(0, 0), (0, Tp - T)])

    n = jnp.arange(Tp, dtype=jnp.float32)
    lfo = jnp.sin(2.0 * np.pi * rate_hz * n / sample_rate)
    delay = (
        jnp.maximum(1.0 + 0.5 * depth * lfo, 0.0)
        * centre_delay_ms
        / 1000.0
        * sample_rate
    )

    def body(i, state):
        u, y, y_last = state
        idx0 = i * W
        d = jax.lax.dynamic_slice(delay, (idx0,), (W,))
        xseg = jax.lax.dynamic_slice(xp, (0, idx0), (C, W))
        # JUCE convention: Di = floor(D), f = D - Di; taps u[n-Di], u[n-Di-1].
        # Integer tap arithmetic avoids f32 position loss at large n.
        di = jnp.floor(d).astype(jnp.int32)
        f = d - di.astype(jnp.float32)
        pi = (idx0 + jnp.arange(W, dtype=jnp.int32)) - di
        tap0 = jnp.where(pi >= 0, u[:, jnp.clip(pi, 0, Tp - 1)], 0.0)
        tap1 = jnp.where(pi - 1 >= 0, u[:, jnp.clip(pi - 1, 0, Tp - 1)], 0.0)
        yseg = (1.0 - f) * tap0 + f * tap1  # (C, W)
        useg = xseg - feedback * jnp.concatenate([y_last, yseg[:, :-1]], axis=-1)
        u = jax.lax.dynamic_update_slice(u, useg, (0, idx0))
        y = jax.lax.dynamic_update_slice(y, yseg, (0, idx0))
        return u, y, yseg[:, -1:]

    u0 = jnp.zeros_like(xp)
    y0 = jnp.zeros_like(xp)
    u, y, _ = jax.lax.fori_loop(0, n_chunks, body, (u0, y0, jnp.zeros((C, 1), x.dtype)))
    out = (1.0 - mix) * xp + mix * y
    return out[:, :T].astype(x.dtype)


def make(sample_rate, **overrides) -> RandomEffect:
    ranges = {**DEFAULT_RANGES, **overrides}
    W = chunk_size(ranges, sample_rate)

    def render(x, params, sr):
        return _render(
            x,
            params["rate_hz"],
            params["depth"],
            params["centre_delay_ms"],
            params["feedback"],
            params["mix"],
            int(sr),
            W,
        )

    return RandomEffect("chorus", sample_rate, sample_params, render, ranges)

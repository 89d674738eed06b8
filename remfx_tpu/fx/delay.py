"""Feedback delay — exact FFT-domain evaluation.

Parity target: pedalboard ``Delay`` (JUCE ``DelayLine`` with linear
interpolation), reference ``RandomPedalboardDelay``
(remfx/effects.py:341-367, including the ``max_delay_sconds`` kwarg typo
preserved at the config surface). Per sample:

    d[n] = (1-f)*u[n-Di] + f*u[n-Di-1]        (pop, linear interp)
    u[n] = x[n] + feedback * d[n]             (push)
    y[n] = (1-mix) * x[n] + mix * d[n]

This system is LTI for fixed params, so instead of a 262k-step loop we
evaluate its closed-form transfer function

    Z(z) = z^{-Di} ((1-f) + f z^{-1});   H = (1-mix) + mix * Z / (1 - fb*Z)

at the rfft bins and apply via the long-FFT path (TPU: MXU 4-step FFT).
Zero padding is sized from the static parameter *ranges* so the wrapped
feedback tail is < 1e-6.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.fx.base import RandomEffect, loguniform, uniform
from remfx_tpu.ops.fft import cdiv, cmul, irfft_ri, rfft_ri

DEFAULT_RANGES = {
    "min_delay_seconds": 0.1,
    "max_delay_sconds": 1.0,  # sic — reference API typo is part of the surface
    "min_feedback": 0.05,
    "max_feedback": 0.6,
    "min_mix": 0.0,
    "max_mix": 0.7,
}


def sample_params(key, sample_rate, ranges):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "delay_seconds": loguniform(
            k1, ranges["min_delay_seconds"], ranges["max_delay_sconds"]
        ),
        "feedback": uniform(k2, ranges["min_feedback"], ranges["max_feedback"]),
        "mix": uniform(k3, ranges["min_mix"], ranges["max_mix"]),
    }


def tail_samples(max_delay_seconds, max_feedback, sample_rate, tol=1e-6):
    """Static pad length bounding the wrapped feedback tail below tol."""
    fb = min(max(max_feedback, 1e-3), 0.999)
    round_trips = math.ceil(math.log(tol) / math.log(fb)) if fb > tol else 1
    return int(math.ceil(round_trips * max_delay_seconds * sample_rate))


@partial(jax.jit, static_argnames=("n_fft",))
def _render_fft(x, delay_samples, feedback, mix, n_fft):
    T = x.shape[-1]
    w = jnp.arange(n_fft // 2 + 1, dtype=jnp.float32) * (2.0 * np.pi / n_fft)
    di = jnp.floor(delay_samples)
    f = delay_samples - di
    # Z = e^{-jw*Di} * ((1-f) + f e^{-jw})
    ang = w * di
    zr, zi = jnp.cos(ang), -jnp.sin(ang)
    ir = (1.0 - f) + f * jnp.cos(w)
    ii = -f * jnp.sin(w)
    Zr, Zi = cmul(zr, zi, ir, ii)
    # H = (1-mix) + mix * Z / (1 - fb Z)
    Gr, Gi = cdiv(Zr, Zi, 1.0 - feedback * Zr, -feedback * Zi)
    Hr = (1.0 - mix) + mix * Gr
    Hi = mix * Gi
    Xr, Xi = rfft_ri(x, n_fft)
    Yr, Yi = cmul(Xr, Xi, Hr, Hi)
    return irfft_ri(Yr, Yi, n_fft)[..., :T].astype(x.dtype)


def make(sample_rate, **overrides) -> RandomEffect:
    ranges = {**DEFAULT_RANGES, **overrides}
    pad = tail_samples(
        ranges["max_delay_sconds"], ranges["max_feedback"], sample_rate
    )

    def render(x, params, sr):
        n_fft = 1 << int(x.shape[-1] + pad - 1).bit_length()
        return _render_fft(
            x,
            params["delay_seconds"] * sr,
            params["feedback"],
            params["mix"],
            n_fft,
        )

    return RandomEffect("delay", sample_rate, sample_params, render, ranges)

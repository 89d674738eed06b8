"""Random parametric EQ — low shelf → N peaking bands → high shelf.

Parity target: reference ``RandomParametricEQ`` + ``parametric_eq``
(remfx/effects.py:94-214): RBJ biquad cascade applied with
``scipy.signal.lfilter``. We evaluate the cascade's closed-form response
and apply it via the FFT-LTI path (exact; see PERF_NOTES.md on why
scan-based IIR is unsafe for 20 Hz shelves).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from remfx_tpu.fx.base import RandomEffect, loguniform, uniform
from remfx_tpu.ops.biquad import biquad_coeffs
from remfx_tpu.ops.fftfilt import apply_lti_ri, biquad_response_ri, rfft_omega
from remfx_tpu.ops.fft import cmul

DEFAULT_RANGES = {
    "num_bands": 3,
    "min_gain_db": -6.0,
    "max_gain_db": 6.0,
    "min_cutoff_freq": 1000.0,
    "max_cutoff_freq": 10000.0,
    "min_q_factor": 0.1,
    "max_q_factor": 4.0,
}


def sample_params(key, sample_rate, ranges):
    num_bands = int(ranges["num_bands"])
    ks = jax.random.split(key, 6 + 3 * num_bands)
    params = {
        "low_shelf_gain_db": uniform(ks[0], ranges["min_gain_db"], ranges["max_gain_db"]),
        "low_shelf_cutoff_freq": loguniform(ks[1], 20.0, 200.0),
        "low_shelf_q_factor": uniform(ks[2], ranges["min_q_factor"], ranges["max_q_factor"]),
        "high_shelf_gain_db": uniform(ks[3], ranges["min_gain_db"], ranges["max_gain_db"]),
        "high_shelf_cutoff_freq": loguniform(ks[4], 8000.0, 16000.0),
        "high_shelf_q_factor": uniform(ks[5], ranges["min_q_factor"], ranges["max_q_factor"]),
        "band_gains_db": jnp.stack(
            [
                uniform(ks[6 + 3 * i], ranges["min_gain_db"], ranges["max_gain_db"])
                for i in range(num_bands)
            ]
        ),
        "band_cutoff_freqs": jnp.stack(
            [
                loguniform(
                    ks[7 + 3 * i], ranges["min_cutoff_freq"], ranges["max_cutoff_freq"]
                )
                for i in range(num_bands)
            ]
        ),
        "band_q_factors": jnp.stack(
            [
                uniform(ks[8 + 3 * i], ranges["min_q_factor"], ranges["max_q_factor"])
                for i in range(num_bands)
            ]
        ),
    }
    return params


@partial(jax.jit, static_argnames=("sample_rate", "n_fft", "num_bands"))
def _render(x, params, sample_rate, n_fft, num_bands):
    z1r, z1i = rfft_omega(n_fft)
    b, a = biquad_coeffs(
        params["low_shelf_gain_db"],
        params["low_shelf_cutoff_freq"],
        params["low_shelf_q_factor"],
        sample_rate,
        "low_shelf",
    )
    Hr, Hi = biquad_response_ri(b, a, z1r, z1i)
    for i in range(num_bands):
        b, a = biquad_coeffs(
            params["band_gains_db"][i],
            params["band_cutoff_freqs"][i],
            params["band_q_factors"][i],
            sample_rate,
            "peaking",
        )
        hr, hi = biquad_response_ri(b, a, z1r, z1i)
        Hr, Hi = cmul(Hr, Hi, hr, hi)
    b, a = biquad_coeffs(
        params["high_shelf_gain_db"],
        params["high_shelf_cutoff_freq"],
        params["high_shelf_q_factor"],
        sample_rate,
        "high_shelf",
    )
    hr, hi = biquad_response_ri(b, a, z1r, z1i)
    Hr, Hi = cmul(Hr, Hi, hr, hi)
    return apply_lti_ri(x, Hr, Hi, n_fft)


def render(x, params, sample_rate):
    n_fft = 1 << int(2 * x.shape[-1] - 1).bit_length()
    num_bands = params["band_gains_db"].shape[0]
    return _render(x, params, int(sample_rate), n_fft, num_bands)


def make(sample_rate, **overrides) -> RandomEffect:
    ranges = {**DEFAULT_RANGES, **overrides}
    return RandomEffect("parametric_eq", sample_rate, sample_params, render, ranges)

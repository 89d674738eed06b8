"""Sox-style reverb (the reference's alternative ``RandomSoxReverb``).

Parity target: reference remfx/effects.py:516-572 — sox's ``reverb``
effect (freeverb variant, reverb.c) rendered wet-only, then manually
mixed ``x*(1-wet_dry) + y*wet_dry``. Sox parameter mapping (reverb.c):

    feedback  = 1 - exp((reverberance - b) / (a*b)),
                a = -1/ln(1-0.3), b = 100/(ln(1-0.98)*a + 1)
    damping   = hf_damping/100 * 0.3 + 0.7
    scale     = room_scale/100 * 0.9 + 0.1
    comb/allpass lengths = freeverb tunings * (rate/44100) * scale
    pre-delay in ms ahead of the bank; input gain 0.015.

LTI for fixed params -> rendered exactly via the FFT-domain Freeverb
machinery (fx/reverb.py bank response with custom lengths/feedback).
The stereo_depth parameter only affects 2-channel rendering (mono here,
matching the reference's mono-summed pipeline; sampled for RNG parity).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.fx.base import RandomEffect, uniform
from remfx_tpu.fx.reverb import (
    ALLPASS_TUNINGS,
    COMB_TUNINGS,
    bank_response_from_lengths,
)
from remfx_tpu.ops.fft import cdiv, cmul, irfft_ri, rfft_ri

DEFAULT_RANGES = {
    "min_reverberance": 10.0,
    "max_reverberance": 100.0,
    "min_high_freq_damping": 0.0,
    "max_high_freq_damping": 100.0,
    "min_wet_dry": 0.0,
    "max_wet_dry": 1.0,
    "min_room_scale": 5.0,
    "max_room_scale": 100.0,
    "min_stereo_depth": 20.0,
    "max_stereo_depth": 100.0,
    "min_pre_delay": 0.0,
    "max_pre_delay": 100.0,
}

_A = -1.0 / math.log(1.0 - 0.3)
_B = 100.0 / (math.log(1.0 - 0.98) * _A + 1.0)


def sample_params(key, sample_rate, ranges):
    ks = jax.random.split(key, 6)
    return {
        "reverberance": uniform(ks[0], ranges["min_reverberance"], ranges["max_reverberance"]),
        "high_freq_damping": uniform(ks[1], ranges["min_high_freq_damping"], ranges["max_high_freq_damping"]),
        "room_scale": uniform(ks[2], ranges["min_room_scale"], ranges["max_room_scale"]),
        "stereo_depth": uniform(ks[3], ranges["min_stereo_depth"], ranges["max_stereo_depth"]),
        "wet_dry": uniform(ks[4], ranges["min_wet_dry"], ranges["max_wet_dry"]),
        "pre_delay": uniform(ks[5], ranges["min_pre_delay"], ranges["max_pre_delay"]),
    }


@partial(jax.jit, static_argnames=("sample_rate", "n_fft"))
def _render_fft(x, reverberance, hf_damping, room_scale, pre_delay_ms, wet_dry,
                sample_rate, n_fft):
    T = x.shape[-1]
    feedback = 1.0 - jnp.exp((reverberance - _B) / (_A * _B))
    damp = hf_damping / 100.0 * 0.3 + 0.7
    scale = room_scale / 100.0 * 0.9 + 0.1
    r = sample_rate / 44100.0 * scale

    w = jnp.arange(n_fft // 2 + 1, dtype=jnp.float32) * (2.0 * np.pi / n_fft)
    # the Freeverb comb/allpass core is shared with fx/reverb.py; here
    # the tunings scale with room_scale, so lengths are traced scalars
    Hr, Hi = bank_response_from_lengths(
        w,
        [jnp.round(L0 * r) for L0 in COMB_TUNINGS],
        [jnp.round(L0 * r) for L0 in ALLPASS_TUNINGS],
        feedback, damp,
    )
    # pre-delay + input gain
    D = pre_delay_ms / 1000.0 * sample_rate
    pr, pi = jnp.cos(w * D), -jnp.sin(w * D)
    Hr, Hi = cmul(Hr * 0.015, Hi * 0.015, pr, pi)

    Xr, Xi = rfft_ri(x, n_fft)
    Yr, Yi = cmul(Xr, Xi, Hr, Hi)
    wet = irfft_ri(Yr, Yi, n_fft)[..., :T]
    return (x * (1.0 - wet_dry) + wet * wet_dry).astype(x.dtype)


def make(sample_rate, **overrides) -> RandomEffect:
    ranges = {**DEFAULT_RANGES, **overrides}
    # tail: worst feedback at reverberance=100 -> fb=0.98, longest comb
    L = int(1617 * sample_rate / 44100.0 * (ranges["max_room_scale"] / 100 * 0.9 + 0.1))
    pad = int(L * math.log(1e-6) / math.log(0.98)) + int(
        ranges["max_pre_delay"] / 1000.0 * sample_rate
    )

    def render(x, params, sr):
        n_fft = 1 << int(x.shape[-1] + pad - 1).bit_length()
        return _render_fft(
            x,
            params["reverberance"],
            params["high_freq_damping"],
            params["room_scale"],
            params["pre_delay"],
            params["wet_dry"],
            int(sr),
            n_fft,
        )

    return RandomEffect("sox_reverb", sample_rate, sample_params, render, ranges)

"""Freeverb reverb — exact FFT-domain evaluation of the comb/allpass bank.

Parity target: pedalboard ``Reverb`` == ``juce::Reverb`` (Freeverb
tunings), reference ``RandomPedalboardReverb`` (remfx/effects.py:575-616):
``wet_level = wet_dry``, ``dry_level = 1 - wet_dry``.

JUCE semantics reproduced (static parameters — JUCE's 10 ms parameter
smoothing has no effect when params are set before processing):

  * 8 parallel damped feedback combs + 4 series "allpass" sections,
    input pre-gain 0.015.
  * comb lengths = (tuning * sr) // 44100 (integer division), tunings
    {1116,1188,1277,1356,1422,1491,1557,1617}; right channel adds a
    23-sample stereo spread; allpass tunings {556,441,341,225}.
  * feedback = room_size * 0.28 + 0.7; damp = damping * 0.4.
  * mono out = wet1 * reverb(x) + 2*dry_level * x with
    wet1 = 3*wet_level * 0.5*(1+width);
    stereo uses wet1/wet2 cross-mixing of the two channel banks.

The whole bank is LTI, so we evaluate its closed-form response

  comb_L(z)  = z^-L (1 - d z^-1) / ((1 - d z^-1) - fb (1-d) z^-L)
  ap_L(z)    = (1.5 z^-L - 1) / (1 - 0.5 z^-L)
  H(z)       = gain * [Σ_c comb(z)] * Π_a ap(z)

at the rfft bins and convolve via the long-FFT path — no sequential
loops at all. Padding is sized from the static max room_size so the
wrapped tail is below ~1e-6 of the input.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.fx.base import RandomEffect, uniform
from remfx_tpu.ops.fft import cdiv, cmul, irfft_ri, rfft_ri

COMB_TUNINGS = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)
ALLPASS_TUNINGS = (556, 441, 341, 225)
STEREO_SPREAD = 23
GAIN = 0.015

DEFAULT_RANGES = {
    "min_room_size": 0.0,
    "max_room_size": 1.0,
    "min_damping": 0.0,
    "max_damping": 1.0,
    "min_wet_dry": 0.0,
    "max_wet_dry": 0.7,
    "min_width": 0.0,
    "max_width": 1.0,
}


def sample_params(key, sample_rate, ranges):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "room_size": uniform(k1, ranges["min_room_size"], ranges["max_room_size"]),
        "damping": uniform(k2, ranges["min_damping"], ranges["max_damping"]),
        "wet_dry": uniform(k3, ranges["min_wet_dry"], ranges["max_wet_dry"]),
        "width": uniform(k4, ranges["min_width"], ranges["max_width"]),
    }


def comb_lengths(sample_rate: int, spread: int = 0):
    return [t * int(sample_rate) // 44100 + spread for t in COMB_TUNINGS]


def allpass_lengths(sample_rate: int, spread: int = 0):
    return [t * int(sample_rate) // 44100 + spread for t in ALLPASS_TUNINGS]


def tail_samples(max_room_size, sample_rate, tol=1e-6):
    fb = min(max_room_size * 0.28 + 0.7, 0.985)
    L = max(comb_lengths(sample_rate))
    return int(math.ceil(L * math.log(tol) / math.log(fb)))


def bank_response_from_lengths(w, comb_Ls, allpass_Ls, feedback, damp):
    """(re, im) response of [Σ damped combs] * Π allpasses at angles w.

    The Freeverb core shared by PedalboardReverb (static per-sample-rate
    lengths) and SoxReverb (room-scale-traced lengths, fx/sox_reverb.py):
    comb H = z^-L (1 - d z^-1) / ((1 - d z^-1) - fb (1-d) z^-L), allpass
    H = (1.5 z^-L - 1) / (1 - 0.5 z^-L). Lengths may be python ints or
    traced scalars — only w * L is formed."""
    Hr = jnp.zeros_like(w)
    Hi = jnp.zeros_like(w)
    cw, sw = jnp.cos(w), jnp.sin(w)
    for L in comb_Ls:
        zLr, zLi = jnp.cos(w * L), -jnp.sin(w * L)
        # (1 - d z^-1)
        dr, di_ = 1.0 - damp * cw, damp * sw
        # numerator z^-L (1 - d z^-1)
        nr, ni = cmul(zLr, zLi, dr, di_)
        # denominator (1 - d z^-1) - fb (1-d) z^-L
        er = dr - feedback * (1.0 - damp) * zLr
        ei = di_ - feedback * (1.0 - damp) * zLi
        cr_, ci_ = cdiv(nr, ni, er, ei)
        Hr, Hi = Hr + cr_, Hi + ci_
    for L in allpass_Ls:
        zLr, zLi = jnp.cos(w * L), -jnp.sin(w * L)
        nr, ni = 1.5 * zLr - 1.0, 1.5 * zLi
        er, ei = 1.0 - 0.5 * zLr, -0.5 * zLi
        ar, ai = cdiv(nr, ni, er, ei)
        Hr, Hi = cmul(Hr, Hi, ar, ai)
    return Hr, Hi


def _bank_response(w, feedback, damp, sample_rate, spread):
    """(re, im) response of gain * [Σ combs] * Π allpasses at angles w."""
    Hr, Hi = bank_response_from_lengths(
        w, comb_lengths(sample_rate, spread),
        allpass_lengths(sample_rate, spread), feedback, damp,
    )
    return GAIN * Hr, GAIN * Hi


@partial(jax.jit, static_argnames=("sample_rate", "n_fft"))
def _render_fft(x, room_size, damping, wet_dry, width, sample_rate, n_fft):
    """x: (C, T) with C in {1, 2}."""
    T = x.shape[-1]
    feedback = room_size * 0.28 + 0.7
    damp = damping * 0.4
    wet = wet_dry * 3.0
    dry = (1.0 - wet_dry) * 2.0
    wet1 = 0.5 * wet * (1.0 + width)
    wet2 = 0.5 * wet * (1.0 - width)

    w = jnp.arange(n_fft // 2 + 1, dtype=jnp.float32) * (2.0 * np.pi / n_fft)
    HrL, HiL = _bank_response(w, feedback, damp, sample_rate, 0)

    if x.shape[0] == 1:
        Xr, Xi = rfft_ri(x, n_fft)
        Yr, Yi = cmul(Xr, Xi, HrL, HiL)
        out = irfft_ri(Yr, Yi, n_fft)[..., :T]
        return (out * wet1 + x * dry).astype(x.dtype)
    # stereo: both channel banks driven by the channel sum (JUCE
    # processStereo: input = (L + R) * gain — gain folded into bank)
    HrR, HiR = _bank_response(w, feedback, damp, sample_rate, STEREO_SPREAD)
    mix = x[0:1] + x[1:2]
    Mr, Mi = rfft_ri(mix, n_fft)
    YLr, YLi = cmul(Mr, Mi, HrL, HiL)
    YRr, YRi = cmul(Mr, Mi, HrR, HiR)
    outL = irfft_ri(YLr, YLi, n_fft)[..., :T]
    outR = irfft_ri(YRr, YRi, n_fft)[..., :T]
    yL = outL * wet1 + outR * wet2 + x[0:1] * dry
    yR = outR * wet1 + outL * wet2 + x[1:2] * dry
    return jnp.concatenate([yL, yR], axis=0).astype(x.dtype)


def make(sample_rate, **overrides) -> RandomEffect:
    ranges = {**DEFAULT_RANGES, **overrides}
    pad = tail_samples(ranges["max_room_size"], sample_rate)

    def render(x, params, sr):
        n_fft = 1 << int(x.shape[-1] + pad - 1).bit_length()
        return _render_fft(
            x,
            params["room_size"],
            params["damping"],
            params["wet_dry"],
            params["width"],
            int(sr),
            n_fft,
        )

    return RandomEffect("reverb", sample_rate, sample_params, render, ranges)

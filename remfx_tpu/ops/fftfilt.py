"""Exact FFT-domain application of LTI systems — complex-free.

TPU-first replacement for sequential IIR loops: any *linear
time-invariant* effect (parametric EQ biquad cascades, feedback delay,
Freeverb) has a closed-form frequency response, so we evaluate
``y = irfft(rfft(pad(x)) * H)`` with enough zero padding that the
circularly-wrapped impulse-response tail is below f32 noise. This is
embarrassingly parallel (no scan at all) and numerically *stable* where
companion-matrix scans suffer cancellation for poles near |z|=1.

The target TPU backend has no complex dtype, so responses are carried
as ``(re, im)`` pairs and transforms go through ops/fft.py (MXU matmul
DFT / 4-step long FFT).

Padding policy: callers pass an FFT size with pad ≥ ~20 time constants
of the slowest pole. For the reference's EQ parameter ranges (cutoff ≥
20 Hz, Q ∈ [0.1, 4] @ 48 kHz) doubling the length bounds the wrap error
at e^-85.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.ops.fft import cdiv, cmul, irfft_ri, rfft_ri


def next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@partial(jax.jit, static_argnames=("n_fft",))
def apply_lti_ri(x: jax.Array, Hr: jax.Array, Hi: jax.Array, n_fft: int) -> jax.Array:
    """Filter ``x (..., T)`` by frequency response (Hr, Hi) at the rfft
    bins of an n_fft-point FFT. Returns the first T samples."""
    T = x.shape[-1]
    Xr, Xi = rfft_ri(x, n_fft)
    Yr, Yi = cmul(Xr, Xi, Hr, Hi)
    y = irfft_ri(Yr, Yi, n_fft)
    return y[..., :T].astype(x.dtype)


def rfft_omega(n_fft: int):
    """(cos, -sin) of the rfft bin angles == re/im of z^{-1}."""
    w = np.arange(n_fft // 2 + 1) * (2.0 * np.pi / n_fft)
    return jnp.asarray(np.cos(w), jnp.float32), jnp.asarray(-np.sin(w), jnp.float32)


def delay_response(z1r, z1i, delay_samples):
    """z^{-D} for (possibly fractional, traced) D: e^{-j w D}.

    z1 = e^{-jw} so z^{-D} = cos(wD) - j sin(wD); compute from the bin
    angle directly for accuracy.
    """
    # recover w from z1: w = atan2(-z1i, z1r) in [0, pi]
    w = jnp.arctan2(-z1i, z1r)
    ang = w * delay_samples
    return jnp.cos(ang), -jnp.sin(ang)


def biquad_response_ri(b: jax.Array, a: jax.Array, z1r: jax.Array, z1i: jax.Array):
    """H(z) of one biquad at points z^{-1} = (z1r, z1i). b/a: (..., 3)."""
    z2r, z2i = cmul(z1r, z1i, z1r, z1i)
    nr = b[..., 0:1] + b[..., 1:2] * z1r + b[..., 2:3] * z2r
    ni = b[..., 1:2] * z1i + b[..., 2:3] * z2i
    dr = a[..., 0:1] + a[..., 1:2] * z1r + a[..., 2:3] * z2r
    di = a[..., 1:2] * z1i + a[..., 2:3] * z2i
    return cdiv(nr, ni, dr, di)


def cascade_response_ri(bs, aas, z1r, z1i):
    """Product response of a biquad cascade."""
    Hr = jnp.ones_like(z1r)
    Hi = jnp.zeros_like(z1i)
    for b, a in zip(bs, aas):
        hr, hi = biquad_response_ri(b, a, z1r, z1i)
        Hr, Hi = cmul(Hr, Hi, hr, hi)
    return Hr, Hi

"""Biquad design + parallel IIR filtering on TPU.

The reference designs RBJ-style shelving/peaking biquads in numpy and runs
them through ``scipy.signal.lfilter`` — a sequential C loop (reference
remfx/effects.py:37-150). On TPU we keep the *design* math identical but
evaluate the recurrence with ``jax.lax.associative_scan`` over the time
axis: an order-2 IIR is a first-order vector recurrence
``s[n] = A @ s[n-1] + u[n]`` whose composition is associative, so the
whole 262k-sample filter runs in log2(T) data-parallel passes on the VPU
instead of T sequential steps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def biquad_coeffs(
    gain_db,
    cutoff_freq,
    q_factor,
    sample_rate,
    filter_type: str,
):
    """RBJ biquad design. Returns (b, a) normalized so a0 == 1.

    Math identical to the reference's ``biqaud`` (remfx/effects.py:37-91).
    Accepts scalars or arrays (vectorized over leading dims). Works under
    jit/vmap (jnp ops only).
    """
    gain_db = jnp.asarray(gain_db, jnp.float32)
    cutoff_freq = jnp.asarray(cutoff_freq, jnp.float32)
    q_factor = jnp.asarray(q_factor, jnp.float32)

    A = 10.0 ** (gain_db / 40.0)
    w0 = 2.0 * jnp.pi * (cutoff_freq / sample_rate)
    alpha = jnp.sin(w0) / (2.0 * q_factor)
    cos_w0 = jnp.cos(w0)
    sqrt_A = jnp.sqrt(A)

    if filter_type == "high_shelf":
        b0 = A * ((A + 1) + (A - 1) * cos_w0 + 2 * sqrt_A * alpha)
        b1 = -2 * A * ((A - 1) + (A + 1) * cos_w0)
        b2 = A * ((A + 1) + (A - 1) * cos_w0 - 2 * sqrt_A * alpha)
        a0 = (A + 1) - (A - 1) * cos_w0 + 2 * sqrt_A * alpha
        a1 = 2 * ((A - 1) - (A + 1) * cos_w0)
        a2 = (A + 1) - (A - 1) * cos_w0 - 2 * sqrt_A * alpha
    elif filter_type == "low_shelf":
        b0 = A * ((A + 1) - (A - 1) * cos_w0 + 2 * sqrt_A * alpha)
        b1 = 2 * A * ((A - 1) - (A + 1) * cos_w0)
        b2 = A * ((A + 1) - (A - 1) * cos_w0 - 2 * sqrt_A * alpha)
        a0 = (A + 1) + (A - 1) * cos_w0 + 2 * sqrt_A * alpha
        a1 = -2 * ((A - 1) + (A + 1) * cos_w0)
        a2 = (A + 1) + (A - 1) * cos_w0 - 2 * sqrt_A * alpha
    elif filter_type == "peaking":
        b0 = 1 + alpha * A
        b1 = -2 * cos_w0
        b2 = 1 - alpha * A
        a0 = 1 + alpha / A
        a1 = -2 * cos_w0
        a2 = 1 - alpha / A
    else:
        raise ValueError(f"unknown filter_type {filter_type}")

    b = jnp.stack([b0 / a0, b1 / a0, b2 / a0], axis=-1)
    a = jnp.stack([jnp.ones_like(a0), a1 / a0, a2 / a0], axis=-1)
    return b, a


def _ar2_scan(f: jax.Array, a1, a2) -> jax.Array:
    """Solve y[n] = f[n] - a1*y[n-1] - a2*y[n-2] (zero initial state) in
    parallel via associative scan.

    ``f``: (..., T). ``a1``/``a2``: broadcastable to f[..., 0].
    """
    a1 = jnp.broadcast_to(jnp.asarray(a1, f.dtype), f.shape[:-1])[..., None]
    a2 = jnp.broadcast_to(jnp.asarray(a2, f.dtype), f.shape[:-1])[..., None]
    T = f.shape[-1]
    # state s[n] = (y[n], y[n-1]); s[n] = M s[n-1] + (f[n], 0)
    # element = (m11,m12,m21,m22, v1,v2); combine right∘left.
    m11 = jnp.broadcast_to(-a1, f.shape)
    m12 = jnp.broadcast_to(-a2, f.shape)
    m21 = jnp.ones_like(f)
    m22 = jnp.zeros_like(f)
    v1 = f
    v2 = jnp.zeros_like(f)

    def combine(left, right):
        l11, l12, l21, l22, lv1, lv2 = left
        r11, r12, r21, r22, rv1, rv2 = right
        c11 = r11 * l11 + r12 * l21
        c12 = r11 * l12 + r12 * l22
        c21 = r21 * l11 + r22 * l21
        c22 = r21 * l12 + r22 * l22
        cv1 = r11 * lv1 + r12 * lv2 + rv1
        cv2 = r21 * lv1 + r22 * lv2 + rv2
        return c11, c12, c21, c22, cv1, cv2

    out = jax.lax.associative_scan(
        combine, (m11, m12, m21, m22, v1, v2), axis=f.ndim - 1
    )
    del T
    return out[4]  # y[n]


@partial(jax.jit, static_argnames=())
def biquad_filter(b: jax.Array, a: jax.Array, x: jax.Array) -> jax.Array:
    """Apply one biquad (zero initial conditions) along the last axis.

    ``b``/``a``: (..., 3) with a[...,0]==1, broadcastable to x's batch dims.
    Equivalent to ``scipy.signal.lfilter(b, a, x)`` up to f32 reassociation.
    """
    x = jnp.asarray(x)
    b = jnp.asarray(b, x.dtype)
    a = jnp.asarray(a, x.dtype)
    # FIR part: f[n] = b0 x[n] + b1 x[n-1] + b2 x[n-2]
    x1 = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(1, 0)])[..., :-1]
    x2 = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(2, 0)])[..., :-2]
    f = b[..., 0:1] * x + b[..., 1:2] * x1 + b[..., 2:3] * x2
    return _ar2_scan(f, a[..., 1], a[..., 2])


def sosfilt(sos_b: jax.Array, sos_a: jax.Array, x: jax.Array) -> jax.Array:
    """Cascade of biquad sections. ``sos_b``/``sos_a``: (n_sections, ..., 3)."""
    n_sections = sos_b.shape[0]
    for i in range(n_sections):
        x = biquad_filter(sos_b[i], sos_a[i], x)
    return x


# Frequency-response evaluation lives in ops/fftfilt.py (complex-free
# (re, im) form — the target TPU backend has no complex dtype).

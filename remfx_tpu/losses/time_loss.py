"""Time-domain losses: SI-SDR and L1.

Parity target: ``auraloss.time.SISDRLoss`` defaults (zero_mean=True,
eps=1e-8) as used for metrics in the reference (remfx/models.py:41,
122-136 — note the reference *negates* the loss when logging so that
higher = better; we expose both conventions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sisdr_loss(
    x: jax.Array, y: jax.Array, zero_mean: bool = True, eps: float = 1e-8
) -> jax.Array:
    """Negative SI-SDR averaged over all leading dims (auraloss SISDRLoss).

    ``x`` = estimate, ``y`` = target, shape (..., T).
    """
    if zero_mean:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
        y = y - jnp.mean(y, axis=-1, keepdims=True)
    alpha = jnp.sum(x * y, axis=-1) / (jnp.sum(y**2, axis=-1) + eps)
    target = y * alpha[..., None]
    res = x - target
    ratio = jnp.sum(target**2, axis=-1) / (jnp.sum(res**2, axis=-1) + eps)
    losses = 10.0 * jnp.log10(ratio + eps)
    return -jnp.mean(losses)


def si_sdr(x: jax.Array, y: jax.Array) -> jax.Array:
    """SI-SDR in dB, higher is better (the logged metric convention)."""
    return -sisdr_loss(x, y)


def l1_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    # reduce in fp32 regardless of (possibly bf16) compute dtype
    return jnp.mean(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))

"""Compressor — JUCE ``dsp::Compressor`` semantics.

Parity target: pedalboard ``Compressor``, reference
``RandomPedalboardCompressor`` (remfx/effects.py:297-338). Per sample:

    env[n]  = ballistics(|x[n]|):   env = xa + cte*(env' - xa),
              cte = cteAT if xa > env' else cteRL,
              cteX = exp(-2π*1000 / (sr * time_ms))   (0 if time < 1e-3 ms)
    gain[n] = 1                      if env < thresh_lin
              (env/thresh)^(1/ratio - 1)  otherwise
    y[n]    = gain[n] * x[n]

The envelope's branch condition is data-dependent (nonlinear), so no
FFT/associative shortcut exists; we run a ``lax.scan`` over time with the
channel/batch dims vectorized in the carry. A Pallas batch-parallel
kernel backs the hot path (ops/pallas) once validated against this scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.fx.base import RandomEffect, uniform

DEFAULT_RANGES = {
    "min_threshold_db": -42.0,
    "max_threshold_db": -6.0,
    "min_ratio": 1.5,
    "max_ratio": 4.0,
    "min_attack_ms": 1.0,
    "max_attack_ms": 50.0,
    "min_release_ms": 10.0,
    "max_release_ms": 250.0,
}


def sample_params(key, sample_rate, ranges):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "threshold_db": uniform(
            k1, ranges["min_threshold_db"], ranges["max_threshold_db"]
        ),
        "ratio": uniform(k2, ranges["min_ratio"], ranges["max_ratio"]),
        "attack_ms": uniform(k3, ranges["min_attack_ms"], ranges["max_attack_ms"]),
        "release_ms": uniform(k4, ranges["min_release_ms"], ranges["max_release_ms"]),
    }


def ballistics_cte(time_ms, sample_rate):
    """JUCE BallisticsFilter coefficient; 0 below 1e-3 ms."""
    exp_factor = -2.0 * np.pi * 1000.0 / sample_rate
    return jnp.where(time_ms < 1.0e-3, 0.0, jnp.exp(exp_factor / time_ms))


def envelope_scan(x_abs, cte_at, cte_rl):
    """Peak ballistics envelope over the last axis via lax.scan.

    ``x_abs (..., T)``; coefficients broadcastable to the batch dims.
    """
    xt = jnp.moveaxis(x_abs, -1, 0)  # (T, ...)

    def step(yold, xa):
        cte = jnp.where(xa > yold, cte_at, cte_rl)
        env = xa + cte * (yold - xa)
        return env, env

    _, env = jax.lax.scan(step, jnp.zeros_like(xt[0]), xt)
    return jnp.moveaxis(env, 0, -1)


def compressor_gain(env, threshold_db, ratio):
    thresh = 10.0 ** (threshold_db / 20.0)
    expo = 1.0 / ratio - 1.0
    return jnp.where(env < thresh, 1.0, jnp.exp(expo * jnp.log(env / thresh + 1e-30)))


@partial(jax.jit, static_argnames=("sample_rate",))
def _render(x, threshold_db, ratio, attack_ms, release_ms, sample_rate):
    cte_at = ballistics_cte(attack_ms, sample_rate)
    cte_rl = ballistics_cte(release_ms, sample_rate)
    env = envelope_scan(jnp.abs(x), cte_at, cte_rl)
    return (compressor_gain(env, threshold_db, ratio) * x).astype(x.dtype)


def render(x, params, sample_rate):
    return _render(
        x,
        params["threshold_db"],
        params["ratio"],
        params["attack_ms"],
        params["release_ms"],
        int(sample_rate),
    )


@partial(jax.jit, static_argnames=("sample_rate",))
def render_batch(xb, params, sample_rate):
    """Natively-batched render via the Pallas envelope kernel (TPU) or the
    scan (CPU). xb: (B, C, T); params: pytree of (B,) scalars."""
    from remfx_tpu.ops.pallas_env import envelope_pallas

    B, C, T = xb.shape
    cte_at = ballistics_cte(params["attack_ms"], sample_rate)  # (B,)
    cte_rl = ballistics_cte(params["release_ms"], sample_rate)
    flat = jnp.abs(xb).reshape(B * C, T)
    rep = lambda v: jnp.repeat(v, C, axis=0)
    if jax.default_backend() == "cpu":
        env = envelope_scan(flat, rep(cte_at), rep(cte_rl))
    else:
        env = envelope_pallas(flat, rep(cte_at), rep(cte_rl))
    env = env.reshape(B, C, T)
    gain = compressor_gain(
        env, params["threshold_db"][:, None, None], params["ratio"][:, None, None]
    )
    return (gain * xb).astype(xb.dtype)


def make(sample_rate, **overrides) -> RandomEffect:
    ranges = {**DEFAULT_RANGES, **overrides}
    return RandomEffect(
        "compressor", sample_rate, sample_params, render, ranges,
        batch_render_fn=render_batch,
    )

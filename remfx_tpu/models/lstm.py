"""LSTM / BiLSTM with torch-compatible parameterization.

Torch layout per layer/direction: weight_ih (4H, in), weight_hh (4H, H),
bias_ih (4H,), bias_hh (4H,), gate order [i, f, g, o]. Keeping this
layout makes the compat converters a pure name-map (no re-ordering), and
the recurrence runs as one ``lax.scan`` over time with the gate matmuls
batched on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lstm_scan(x, w_ih, w_hh, b_ih, b_hh, reverse=False):
    """x: (T, B, in) -> (T, B, H). Zero initial state (torch default)."""
    H = w_hh.shape[1]
    B = x.shape[1]
    # precompute input contributions for all steps at once (MXU-friendly)
    xi = jnp.einsum("tbi,gi->tbg", x, w_ih) + b_ih + b_hh  # (T, B, 4H)
    if reverse:
        xi = xi[::-1]

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh.T  # (B, 4H)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, hs = jax.lax.scan(step, init, xi)
    if reverse:
        hs = hs[::-1]
    return hs


class LSTM(nn.Module):
    """Multi-layer (bi)LSTM over (T, B, F) sequences, torch semantics
    (inter-layer dropout on all but the last layer)."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        directions = 2 if self.bidirectional else 1

        # torch nn.LSTM resets every parameter (weights AND biases) to
        # U(-k, k), k = 1/sqrt(hidden_size); flax's uniform(scale) is
        # one-sided U[0, scale) and would start all gates saturated
        def u_init(key, shape, dtype=jnp.float32):
            k = 1.0 / jnp.sqrt(self.hidden_size)
            return jax.random.uniform(key, shape, dtype, -k, k)

        for layer in range(self.num_layers):
            outs = []
            for d in range(directions):
                sfx = f"_l{layer}" + ("_reverse" if d else "")
                in_f = x.shape[-1]
                w_ih = self.param(
                    f"weight_ih{sfx}", u_init, (4 * self.hidden_size, in_f)
                )
                w_hh = self.param(
                    f"weight_hh{sfx}", u_init,
                    (4 * self.hidden_size, self.hidden_size),
                )
                b_ih = self.param(
                    f"bias_ih{sfx}", u_init, (4 * self.hidden_size,)
                )
                b_hh = self.param(
                    f"bias_hh{sfx}", u_init, (4 * self.hidden_size,)
                )
                outs.append(_lstm_scan(x, w_ih, w_hh, b_ih, b_hh, reverse=bool(d)))
            x = jnp.concatenate(outs, axis=-1) if directions == 2 else outs[0]
            if train and self.dropout > 0 and layer < self.num_layers - 1:
                key = self.make_rng("dropout")
                keep = jax.random.bernoulli(key, 1.0 - self.dropout, x.shape)
                x = jnp.where(keep, x / (1.0 - self.dropout), 0.0)
        return x

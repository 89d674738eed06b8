"""Classification metrics: binary accuracy, multilabel F1 (per-class and
macro) — the torchmetrics surface used by the reference
(remfx/models.py:445-488)."""

from __future__ import annotations

import jax.numpy as jnp


def binary_accuracy(probs, targets, threshold: float = 0.5):
    return jnp.mean((probs > threshold) == (targets > threshold))


def multilabel_f1(probs, targets, threshold: float = 0.5, average: str | None = None):
    """probs/targets: (N, C). average=None -> per-class (C,); "macro" ->
    scalar mean. Matches torchmetrics MultilabelF1Score (global multidim)."""
    preds = probs > threshold
    t = targets > 0.5
    tp = jnp.sum(preds & t, axis=0).astype(jnp.float32)
    fp = jnp.sum(preds & ~t, axis=0).astype(jnp.float32)
    fn = jnp.sum(~preds & t, axis=0).astype(jnp.float32)
    denom = 2 * tp + fp + fn
    f1 = jnp.where(denom > 0, 2 * tp / jnp.maximum(denom, 1e-12), 0.0)
    if average == "macro":
        return jnp.mean(f1)
    return f1

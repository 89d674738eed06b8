"""Distortion — tanh waveshaper with drive gain.

Parity target: pedalboard ``Distortion`` (JUCE): ``y = tanh(x * 10^(drive_db/20))``,
as used by the reference's ``RandomPedalboardDistortion``
(remfx/effects.py:497-513). Default range drive -20..12 dB; the dataset
config narrows to 8..25 dB (cfg/effects/all.yaml:15-19).
"""

from __future__ import annotations

import jax.numpy as jnp

from remfx_tpu.fx.base import RandomEffect, uniform

DEFAULT_RANGES = {"min_drive_db": -20.0, "max_drive_db": 12.0}


def sample_params(key, sample_rate, ranges):
    return {"drive_db": uniform(key, ranges["min_drive_db"], ranges["max_drive_db"])}


def render(x, params, sample_rate):
    gain = 10.0 ** (params["drive_db"] / 20.0)
    return jnp.tanh(x * gain)


def make(sample_rate, **overrides) -> RandomEffect:
    ranges = {**DEFAULT_RANGES, **overrides}
    return RandomEffect("distortion", sample_rate, sample_params, render, ranges)

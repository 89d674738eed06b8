"""Limiter + volume automation + stereo widener + loudness normalize.

Parity targets (reference remfx/effects.py):
  * ``RandomPedalboardLimiter`` (468-494): JUCE ``dsp::Limiter`` = two
    cascaded JUCE compressors (stage 1 fixed: -10 dB, ratio 4, attack
    2 ms, release 200 ms; stage 2: user threshold/release, ratio 1000,
    attack 0.001 ms) followed by a hard clip to [-1, 1].
  * ``RandomVolumeAutomation`` (255-294): 1-3 piecewise-linear gain-ramp
    segments with Dirichlet-split lengths; any tail beyond the filled
    samples keeps 0 dB (reference behavior of the zeros-initialized
    gain buffer).
  * ``stereo_widener`` / ``RandomStereoWidener`` (217-252): mid/side
    scaling by 2(1-w) / 2w with 1/sqrt(2) normalizations.
  * ``LoudnessNormalize`` (619-629): BS.1770 gain to target LUFS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.fx.base import RandomEffect, randint, uniform
from remfx_tpu.fx.compressor import ballistics_cte, compressor_gain, envelope_scan
from remfx_tpu.ops.loudness import loudness_normalize

# ---------------------------------------------------------------- limiter

LIMITER_RANGES = {
    "min_threshold_db": -32.0,
    "max_threshold_db": -6.0,
    "min_release_ms": 10.0,
    "max_release_ms": 300.0,
}


def limiter_sample_params(key, sample_rate, ranges):
    k1, k2 = jax.random.split(key)
    return {
        "threshold_db": uniform(
            k1, ranges["min_threshold_db"], ranges["max_threshold_db"]
        ),
        "release_ms": uniform(k2, ranges["min_release_ms"], ranges["max_release_ms"]),
    }


def _compress(x, threshold_db, ratio, attack_ms, release_ms, sr):
    env = envelope_scan(
        jnp.abs(x), ballistics_cte(attack_ms, sr), ballistics_cte(release_ms, sr)
    )
    return compressor_gain(env, threshold_db, ratio) * x


def limiter_render(x, params, sample_rate):
    sr = int(sample_rate)
    y = _compress(x, -10.0, 4.0, 2.0, 200.0, sr)
    y = _compress(y, params["threshold_db"], 1000.0, 0.001, params["release_ms"], sr)
    return jnp.clip(y, -1.0, 1.0).astype(x.dtype)


def make_limiter(sample_rate, **overrides) -> RandomEffect:
    ranges = {**LIMITER_RANGES, **overrides}
    return RandomEffect(
        "limiter", sample_rate, limiter_sample_params, limiter_render, ranges
    )


# ------------------------------------------------------- volume automation

VOLUME_RANGES = {
    "min_segments": 1,
    "max_segments": 3,
    "min_gain_db": -6.0,
    "max_gain_db": 6.0,
}


def volume_sample_params(key, sample_rate, ranges):
    max_seg = int(ranges["max_segments"])
    k1, k2, k3, k4 = jax.random.split(key, 4)
    num_segments = randint(k1, int(ranges["min_segments"]), max_seg)
    alphas = jax.random.uniform(k2, (max_seg,), jnp.float32, 0.0, 10.0)
    # Dirichlet over the *active* segments, sampled in LOG space
    # (loggamma + masked softmax — what jax.random.dirichlet does
    # internally, but with EXACT -inf masking of inactive segments
    # instead of a tiny alpha, so inactive fractions are exactly 0 and
    # no renormalization division is needed)
    active = jnp.arange(max_seg) < num_segments
    alphas = jnp.maximum(alphas, 1e-3)
    logg = jax.random.loggamma(k3, alphas)
    fractions = jax.nn.softmax(jnp.where(active, logg, -jnp.inf))
    end_gains = jax.random.uniform(
        k4, (max_seg,), jnp.float32, ranges["min_gain_db"], ranges["max_gain_db"]
    )
    return {
        "num_segments": num_segments,
        "fractions": fractions,
        "end_gains_db": end_gains,
    }


def volume_render(x, params, sample_rate):
    T = x.shape[-1]
    max_seg = params["fractions"].shape[0]
    seg_len = jnp.floor(T * params["fractions"]).astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(seg_len)[:-1]])
    n = jnp.arange(T, dtype=jnp.float32)
    gain_db = jnp.zeros((T,), jnp.float32)
    start_gain = jnp.float32(0.0)
    for i in range(max_seg):
        L = seg_len[i]
        s = starts[i]
        end_gain = params["end_gains_db"][i]
        active = i < params["num_segments"]
        # linspace(start, end, L): g[k] = start + (end-start)*k/(L-1)
        denom = jnp.maximum(L - 1, 1).astype(jnp.float32)
        k = n - s.astype(jnp.float32)
        seg_gain = start_gain + (end_gain - start_gain) * k / denom
        in_seg = (n >= s) & (n < s + L) & active
        gain_db = jnp.where(in_seg, seg_gain, gain_db)
        start_gain = jnp.where(active & (L > 0), end_gain, start_gain)
    return (x * 10.0 ** (gain_db / 20.0)).astype(x.dtype)


def make_volume_automation(sample_rate, **overrides) -> RandomEffect:
    ranges = {**VOLUME_RANGES, **overrides}
    return RandomEffect(
        "volume_automation", sample_rate, volume_sample_params, volume_render, ranges
    )


# --------------------------------------------------------- stereo widener

WIDENER_RANGES = {"min_width": 0.0, "max_width": 1.0}


def widener_sample_params(key, sample_rate, ranges):
    return {"width": uniform(key, ranges["min_width"], ranges["max_width"])}


def stereo_widener(x, width):
    sqrt2 = np.sqrt(2.0)
    left, right = x[0], x[1]
    mid = (left + right) / sqrt2 * (2.0 * (1.0 - width))
    side = (left - right) / sqrt2 * (2.0 * width)
    return jnp.stack([(mid + side) / sqrt2, (mid - side) / sqrt2], axis=0)


def widener_render(x, params, sample_rate):
    return stereo_widener(x, params["width"]).astype(x.dtype)


def make_stereo_widener(sample_rate, **overrides) -> RandomEffect:
    ranges = {**WIDENER_RANGES, **overrides}
    return RandomEffect(
        "stereo_widener", sample_rate, widener_sample_params, widener_render, ranges
    )


# ------------------------------------------------------ loudness normalize

class LoudnessNormalize:
    """Deterministic LUFS normalizer (reference remfx/effects.py:619-629)."""

    def __init__(self, sample_rate, target_lufs_db: float = -32.0):
        self.sample_rate = int(sample_rate)
        self.target_lufs_db = target_lufs_db

    def __call__(self, x):
        return loudness_normalize(x, self.sample_rate, self.target_lufs_db)

"""RandomAudioEffectsChannel — full randomized mixing channel.

Parity target: reference ``RandomAudioEffectsChannel``
(remfx/effects.py:632-696): a Compose of RandomApply(effect, p) in the
fixed order EQ → distortion → delay → chorus → phaser → compressor →
reverb → widener → limiter → volume automation, then LUFS normalize.

Each stage is a ``lax.cond`` so only the sampled branch executes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from remfx_tpu.fx import chorus, compressor, delay, distortion, eq, phaser
from remfx_tpu.fx.dynamics import (
    LoudnessNormalize,
    make_limiter,
    make_stereo_widener,
    make_volume_automation,
)
from remfx_tpu.fx import reverb as reverb_mod


class RandomAudioEffectsChannel:
    DEFAULT_PROBS = {
        "parametric_eq": 0.7,
        "distortion": 0.01,
        "delay": 0.1,
        "chorus": 0.01,
        "phaser": 0.01,
        "compressor": 0.4,
        "reverb": 0.2,
        "stereo_widener": 0.3,
        "limiter": 0.3,
        "volume_automation": 0.7,
    }

    def __init__(self, sample_rate, target_lufs_db: float = -32.0, **probs):
        self.sample_rate = sample_rate
        self.probs = dict(self.DEFAULT_PROBS)
        for k, v in probs.items():
            name = k[: -len("_prob")] if k.endswith("_prob") else k
            if name not in self.probs:
                raise ValueError(f"unknown effect prob {k}")
            self.probs[name] = v
        self.effects = {
            "parametric_eq": eq.make(sample_rate),
            "distortion": distortion.make(sample_rate),
            "delay": delay.make(sample_rate),
            "chorus": chorus.make(sample_rate),
            "phaser": phaser.make(sample_rate),
            "compressor": compressor.make(sample_rate),
            "reverb": reverb_mod.make(sample_rate),
            "stereo_widener": make_stereo_widener(sample_rate),
            "limiter": make_limiter(sample_rate),
            "volume_automation": make_volume_automation(sample_rate),
        }
        self.normalize = LoudnessNormalize(sample_rate, target_lufs_db)

    def __call__(self, key, x):
        stereo = x.shape[0] == 2
        for name, effect in self.effects.items():
            if name == "stereo_widener" and not stereo:
                continue  # widener needs 2 channels
            key, k_apply, k_params = jax.random.split(key, 3)
            apply = jax.random.uniform(k_apply, ()) < self.probs[name]
            params = effect.sample_params(k_params)
            x = jax.lax.cond(
                apply,
                lambda v: effect.render(v, params).astype(v.dtype),
                lambda v: v,
                x,
            )
        return self.normalize(x)

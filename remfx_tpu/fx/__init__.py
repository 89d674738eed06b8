"""Effects registry.

The canonical five (label order fixed by ``remfx_tpu.ALL_EFFECTS``,
mirroring reference ``Pedalboard_Effects`` remfx/effects.py:699-707):
reverb, chorus, delay, distortion, compressor. Extras for full mixing-
channel parity: parametric_eq, phaser, limiter, stereo_widener,
volume_automation.
"""

from remfx_tpu.fx import chorus as _chorus
from remfx_tpu.fx import compressor as _compressor
from remfx_tpu.fx import delay as _delay
from remfx_tpu.fx import distortion as _distortion
from remfx_tpu.fx import eq as _eq
from remfx_tpu.fx import phaser as _phaser
from remfx_tpu.fx import reverb as _reverb
from remfx_tpu.fx import sox_reverb as _sox_reverb
from remfx_tpu.fx.base import RandomEffect
from remfx_tpu.fx.chain import RandomAudioEffectsChannel
from remfx_tpu.fx.dynamics import (
    LoudnessNormalize,
    make_limiter,
    make_stereo_widener,
    make_volume_automation,
)

_FACTORIES = {
    "reverb": _reverb.make,
    "chorus": _chorus.make,
    "delay": _delay.make,
    "distortion": _distortion.make,
    "compressor": _compressor.make,
    "parametric_eq": _eq.make,
    "sox_reverb": _sox_reverb.make,
    "phaser": _phaser.make,
    "limiter": make_limiter,
    "stereo_widener": make_stereo_widener,
    "volume_automation": make_volume_automation,
}


def make_effect(name: str, sample_rate, **overrides) -> RandomEffect:
    """Build a randomized effect by canonical name with range overrides
    (the config surface of cfg/effects/all.yaml)."""
    if name not in _FACTORIES:
        raise ValueError(f"unknown effect {name!r}; have {sorted(_FACTORIES)}")
    return _FACTORIES[name](sample_rate, **overrides)


__all__ = [
    "RandomEffect",
    "RandomAudioEffectsChannel",
    "LoudnessNormalize",
    "make_effect",
]

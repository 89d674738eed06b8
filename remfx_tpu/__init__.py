"""remfx_tpu: TPU-native general-purpose audio effect removal framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of mhrice/RemFX
(reference surveyed in SURVEY.md): on-device effect rendering/augmentation,
effect-removal model training (TCN, DCUNet, HDemucs, UMX, DPTNet), a
multi-label effect classifier (Cnn14), and a single-jit dynamic
detect+remove chain.

Design principles (TPU-first, not a port):
  * Effects are pure functions ``(params, x) -> y`` that jit/vmap; LTI
    effects are evaluated exactly in the FFT domain (no sequential loops),
    sequential recurrences use ``lax.scan``/``lax.associative_scan`` or
    Pallas kernels.
  * All training/eval math is static-shape and jit-compiled; batch data
    parallelism + optional tensor sharding via ``jax.sharding.Mesh``.
  * The chain-inference per-example Python loop of the reference
    (reference remfx/models.py:91-105) is replaced by one compiled
    masked multi-model dispatch graph.
"""

__version__ = "0.1.0"

ALL_EFFECTS = [
    "reverb",
    "chorus",
    "delay",
    "distortion",
    "compressor",
]
"""Canonical effect order defining label indices everywhere.

Mirrors ``Pedalboard_Effects`` (reference remfx/effects.py:699-707):
[Reverb, Chorus, Delay, Distortion, Compressor].
"""

# Class-style names used by the reference's config surface
# (e.g. inference_effects_ordering in cfg/exp/remfx_detect.yaml:80-85).
EFFECT_CLASS_NAMES = {
    "RandomPedalboardReverb": "reverb",
    "RandomPedalboardChorus": "chorus",
    "RandomPedalboardDelay": "delay",
    "RandomPedalboardDistortion": "distortion",
    "RandomPedalboardCompressor": "compressor",
}

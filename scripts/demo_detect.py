#!/usr/bin/env python
"""End-to-end detect→remove demo on ONE file with TRAINED weights only
(the reference's north-star flow, scripts/remfx_detect.sh + README.md
"Run RemFX Detect on a single file").

Builds the remfx_detect chain restricted to the vendored trained
checkpoints (so no random-init backbone ever touches the audio), runs
the trained Cnn14 classifier to decide which effects are present, then
removes the detected effects that have trained removers. Reports the
detected labels and, when a target wav is given, SI-SDR before/after.

    python scripts/demo_detect.py +audio_input=in.wav \
        [+target=target.wav] [+output_path=out.wav]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from remfx_tpu.utils import runtime  # noqa: E402

runtime.setup()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from remfx_tpu.chain.build import build_chain  # noqa: E402
from remfx_tpu.config.core import parse_cli  # noqa: E402
from remfx_tpu.data.wav import read_wav, write_wav  # noqa: E402

# first existing dir wins per effect: prefer the strongest vendored
# remover (the round-4 DCUNet reverb_aug supersedes the +0.2 dB UMX)
TRAINED_PREFS = {
    "RandomPedalboardDistortion": ["ckpts/tcn_distortion_aug"],
    "RandomPedalboardCompressor": ["ckpts/demucs_compressor_aug_r5"],
    "RandomPedalboardReverb": ["ckpts/dcunet_reverb_aug_r5",
                               "ckpts/dcunet_reverb_aug_r4",
                               "ckpts/umx_reverb_synth"],
    "RandomPedalboardChorus": ["ckpts/dcunet_chorus_aug_r5"],
    "RandomPedalboardDelay": ["ckpts/dcunet_delay_aug_r5"],
}
TRAINED = {
    k: next((p for p in prefs if Path(p).is_dir()), prefs[-1])
    for k, prefs in TRAINED_PREFS.items()
}


def main():
    cfg = parse_cli(sys.argv[1:])
    in_path = cfg.get("audio_input") or "demos/example_distortion_reverb.wav"
    out_path = cfg.get("output_path") or "demos/example_removed.wav"

    audio, sr = read_wav(in_path)
    assert sr == cfg["sample_rate"], f"expected {cfg['sample_rate']} Hz"
    # reference downmixes stereo by mean (scripts/remfx_detect.py:48);
    # sum would be +6 dB hot and out of the classifier's level range
    audio = audio.mean(0, keepdims=True)

    # trained-weights-only chain: prune the ckpt map to the vendored
    # removers and point the classifier at the trained Cnn14
    cfg["ckpts"] = {
        k: {"model": "tcn", "ckpt_path": v}
        for k, v in TRAINED.items() if Path(v).is_dir()
    }
    cfg["classifier_ckpt"] = next(
        (p for p in ("ckpts/classifier_cnn14_r5", "ckpts/classifier_cnn14_r4",
                     "ckpts/classifier_cnn14")
         if Path(p).is_dir()), "ckpts/classifier_cnn14")
    x = jnp.asarray(audio, jnp.float32)[None]
    chain = build_chain(cfg, x)

    from remfx_tpu import ALL_EFFECTS, EFFECT_CLASS_NAMES

    net, cls_vars = chain.classifier
    probs = np.asarray(net.apply(cls_vars, x))[0]
    labels = chain.detect(x)
    y, _ = chain.remove(x, labels)
    lab = np.asarray(labels)[0]
    report = {
        "input": in_path,
        "detected_effects": [e for e, v in zip(ALL_EFFECTS, lab) if v > 0.5],
        "probs": {e: round(float(p), 3) for e, p in zip(ALL_EFFECTS, probs)},
        "removed": [
            EFFECT_CLASS_NAMES[k] for k in chain.effect_order
            if k in chain.models
            and lab[ALL_EFFECTS.index(EFFECT_CLASS_NAMES[k])] > 0.5
        ],
    }

    y = np.asarray(y[0])
    if cfg.get("target"):
        from remfx_tpu.losses import si_sdr
        from remfx_tpu.utils.crop import causal_crop

        dry, _ = read_wav(cfg["target"])
        dry = jnp.asarray(dry.mean(0, keepdims=True))[None]
        # align with the chain's passthrough cropping (valid-conv
        # backbones shorten output; causal_crop has the reference's
        # exact offset semantics — a 1-sample slip craters SI-SDR)
        T = y.shape[-1]
        dry_c = causal_crop(dry, T) if dry.shape[-1] > T else dry
        in_c = causal_crop(jnp.asarray(audio)[None], T) \
            if audio.shape[-1] > T else jnp.asarray(audio)[None]
        report["input_si_sdr_db"] = round(float(jnp.mean(
            si_sdr(in_c, dry_c))), 2)
        report["output_si_sdr_db"] = round(float(jnp.mean(
            si_sdr(jnp.asarray(y)[None], dry_c))), 2)

    write_wav(out_path, y, cfg["sample_rate"])
    report["output"] = out_path
    print(json.dumps(report))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Perf AND fidelity on the same artifact: run the remove chain with
TRAINED checkpoints on a freshly rendered synthetic eval batch, and
report both the real-time factor and the SI-SDR improvement over the
input. (Round-1 review: the headline RTF was measured with random
weights; this pins the two on one system.)

Usage:
    python scripts/bench_trained_chain.py distortion=ckpts/tcn_distortion_synth \
        [reverb=ckpts/umx_reverb_synth:niter=1 ...] [--batch 16]

Each ckpt dir is the vendored layout (hparams.json + best/ TrainState or
params-only variables/); an optional ``:k=v,...`` suffix sets
inference-only network overrides (e.g. the UMX Wiener-EM post-filter).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from remfx_tpu.utils import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _coerce(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return {"true": True, "false": False}.get(v.lower(), v)


def load_trained(spec: str):
    """``dir[:k=v,...]`` -> (effect, wrapper, vars, fx cfg); the suffix
    sets inference-only network overrides (e.g. ``niter=1``)."""
    from remfx_tpu.train.checkpoint import load_trained_wrapper

    ckpt_dir, _, opts = spec.partition(":")
    overrides = {}
    if opts:
        for kv in opts.split(","):
            k, v = kv.split("=", 1)
            overrides[k] = _coerce(v)
    effect, wrapper, variables = load_trained_wrapper(ckpt_dir, **overrides)
    hp = json.loads((Path(ckpt_dir) / "hparams.json").read_text())
    return effect, wrapper, variables, hp.get("effects", {})


def main():
    from remfx_tpu import ALL_EFFECTS, EFFECT_CLASS_NAMES
    from remfx_tpu.augment.render import EffectChainRenderer
    from remfx_tpu.chain.inference import ChainInference
    from remfx_tpu.data.sources import synthetic_chunk
    from remfx_tpu.losses import si_sdr
    from remfx_tpu.utils.timing import timeit

    args = [a for a in sys.argv[1:]]
    shuffle = "--fixed-order" not in args
    if not shuffle:
        args.remove("--fixed-order")
    B, T = 16, 262144
    for flag in ("--batch", "--T"):
        if flag in args:
            i = args.index(flag)
            val = int(args[i + 1])
            B, T = (val, T) if flag == "--batch" else (B, val)
            del args[i:i + 2]
    specs = dict(a.split("=", 1) for a in args)
    if not specs:
        specs = {"distortion": "ckpts/tcn_distortion_synth"}

    sample_rate = 48000
    class_for = {v: k for k, v in EFFECT_CLASS_NAMES.items()}

    models, effect_names, overrides = {}, [], {}
    for eff, d in specs.items():
        name, wrapper, variables, eff_cfg = load_trained(d)
        assert name == eff, f"{d} was trained for {name}, not {eff}"
        models[class_for[eff]] = (wrapper, variables)
        effect_names.append(eff)
        # merge per-effect: each checkpoint dictates the param ranges for
        # ITS OWN effect; other effects' entries in its cfg only fill
        # gaps (so two ckpts trained on different ranges coexist)
        for k, v in (eff_cfg or {}).items():
            if k == eff or k not in overrides:
                overrides[k] = v
        print(f"loaded {eff} <- {d}", file=sys.stderr)

    # render a synthetic eval batch with exactly the trained effects
    # applied (oracle labels), reference render semantics incl. LUFS
    # normalize + MRSTFT redraw, and the same effect parameter ranges
    # the checkpoints were trained on (cfg/effects/all.yaml)
    # per-example random application order, the reference's eval-set
    # semantics (shuffle_removed_effects in the monolithic/eval configs;
    # cfg/exp/5-5_full.yaml). --fixed-order keeps the old list-order
    # workload (removed-last-outermost — the worst case for FXAug
    # removers, which train with kept effects innermost).
    renderer = EffectChainRenderer(
        sample_rate,
        effects_to_remove=tuple(effect_names),
        num_removed_effects=(len(effect_names), len(effect_names)),
        shuffle_removed_effects=shuffle,
        effect_overrides=overrides,
    )
    rng = np.random.default_rng(0)
    clean = jnp.asarray(np.stack(
        [synthetic_chunk(rng, T, sample_rate) for _ in range(B)]))
    dry, wet, _, wet_labels = renderer.render_batch(
        jax.random.PRNGKey(11), clean)
    jax.block_until_ready(wet)

    order = [c for c in (
        "RandomPedalboardDistortion", "RandomPedalboardCompressor",
        "RandomPedalboardReverb", "RandomPedalboardChorus",
        "RandomPedalboardDelay") if c in models]
    chain = ChainInference(models, sample_rate, effect_order=tuple(order),
                           dispatch="regroup")

    def run():
        out, _ = chain._run_regrouped(wet, wet_labels, chain.effect_order)
        return out

    out = run()  # warm + for fidelity
    jax.block_until_ready(out)
    # backbones that shorten output (valid-conv TCN) are causally
    # cropped by the chain; crop references the same way for alignment
    from remfx_tpu.utils.crop import causal_crop

    Tm = out.shape[-1]
    dry_c = causal_crop(dry, Tm) if dry.shape[-1] > Tm else dry
    wet_c = causal_crop(wet, Tm) if wet.shape[-1] > Tm else wet
    in_sisdr = float(jnp.mean(si_sdr(wet_c, dry_c)))
    out_sisdr = float(jnp.mean(si_sdr(out, dry_c)))

    dt, _ = timeit(run, iters=5, warmup=0)
    rtf = B * T / sample_rate / dt
    print(json.dumps({
        "metric": "trained_chain",
        "effects": effect_names,
        "shuffled_order": shuffle,
        "batch": B,
        "rtf": round(rtf, 1),
        "input_si_sdr_db": round(in_sisdr, 2),
        "output_si_sdr_db": round(out_sisdr, 2),
        "si_sdr_gain_db": round(out_sisdr - in_sisdr, 2),
    }))


if __name__ == "__main__":
    main()

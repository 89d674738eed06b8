#!/usr/bin/env python
"""Headline benchmark: real-time factor of the full 5-effect detect+remove
chain on one TPU chip.

Prints ONE JSON line:
  {"metric": "chain_rtf", "value": N, "unit": "audio-sec/sec/chip",
   "vs_baseline": N/100}

Baseline (BASELINE.md): >=100x real time for the detect+remove chain per
v5e chip. The chain = Cnn14 classifier (48k, 2048/512/128-mel) + five
removal models applied in the reference order with per-example masks.

Round-1 note: the removal backbones are paper-config TCNs (the in-repo
reference model, remfx/tcn.py + cfg/model/tcn.yaml); DCUNet/HDemucs swap
in as they land (their cost is same order of magnitude).
"""

import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from remfx_tpu.chain.inference import DEFAULT_ORDER, ChainInference
    from remfx_tpu.models import make_cnn14, make_model

    sample_rate = 48000
    T = 262144  # the eval chunk size (5.46 s)
    B = 8

    key = jax.random.PRNGKey(0)
    x = 0.1 * jax.random.normal(key, (B, 1, T), jnp.float32)

    models = {}
    for name in DEFAULT_ORDER:
        wrapper = make_model(
            "tcn", nblocks=20, channel_width=256, kernel_size=7,
            stack_size=10, dilation_growth=2, causal=False,
        )
        key, sub = jax.random.split(key)
        variables = wrapper.init(sub, x)
        models[name] = (wrapper, variables)

    cls = make_cnn14(num_classes=5, sample_rate=sample_rate,
                     model_sample_rate=sample_rate, n_fft=2048,
                     hop_length=512, n_mels=128)
    key, sub = jax.random.split(key)
    cls_vars = cls.init({"params": sub}, x, False)

    dispatch = os.environ.get("REMFX_BENCH_DISPATCH", "staged")
    chain = ChainInference(models, sample_rate, classifier=(cls, cls_vars),
                           dispatch=dispatch)
    labels = jnp.ones((B, 5), jnp.float32)

    def run():
        if dispatch == "staged":
            out, _ = chain._run_staged(x, labels, chain.effect_order)
        else:
            model_vars = {k: v for k, (_, v) in models.items()}
            out, _ = chain._chain_fn(chain.effect_order)(
                model_vars, cls_vars, x, labels
            )
        return jax.block_until_ready(out)

    run()  # compile
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters

    audio_sec = B * T / sample_rate
    rtf = audio_sec / dt
    print(json.dumps({
        "metric": "chain_rtf",
        "value": round(rtf, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(rtf / 100.0, 3),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: real-time factor of the full 5-effect detect+remove
chain on one TPU chip, using the reference's published chain composition
(cfg/exp/remfx_detect.yaml): HDemucs for distortion+compressor removal,
DCUNet for reverb+chorus+delay removal, Cnn14 classifier.

Prints ONE JSON line:
  {"metric": "chain_rtf", "value": N, "unit": "audio-sec/sec/chip",
   "vs_baseline": N/100}

Baseline (BASELINE.md): >=100x real time per v5e chip.

Timing forces a scalar readback per iteration — on this backend
``block_until_ready`` alone returns before execution completes
(PERF_NOTES.md), so naive timings are bogus.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from remfx_tpu.utils import runtime  # noqa: E402


def _probe_devices(
    timeout_s: int = int(os.environ.get("REMFX_BENCH_PROBE_TIMEOUT", "180")),
) -> None:
    """Fail fast (honest JSON error line) instead of hanging the whole
    bench when the remote TPU tunnel is down: jax.devices() on a dead
    axon link blocks indefinitely, so probe it in a killable child."""
    try:
        subprocess.run(
            [sys.executable, "-c",
             "from remfx_tpu.utils import runtime; runtime.setup(); "
             "import jax; jax.devices()"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        print(json.dumps({
            "metric": "chain_rtf", "value": 0.0,
            "unit": "audio-sec/sec/chip", "vs_baseline": 0.0,
            "error": f"device backend unreachable ({type(e).__name__}); "
                     "TPU tunnel down?",
        }))
        sys.exit(1)


_probe_devices()

# honors REMFX_PLATFORM (e.g. =cpu for local smoke) and sets the
# per-backend persistent compile cache
runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from remfx_tpu.chain.inference import DEFAULT_ORDER, ChainInference
    from remfx_tpu.models import make_cnn14, make_model
    from remfx_tpu.utils.timing import timeit

    sample_rate = 48000
    T = int(os.environ.get("REMFX_BENCH_T", "262144"))  # eval chunk (5.46 s)
    B = int(os.environ.get("REMFX_BENCH_BATCH", "32"))
    dtype = jnp.bfloat16 if os.environ.get("REMFX_BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    key = jax.random.PRNGKey(0)
    x = 0.1 * jax.random.normal(key, (B, 1, T), jnp.float32)

    # the published chain: demucs for distortion/compressor, dcunet for
    # reverb/chorus/delay (cfg/exp/remfx_detect.yaml:63-78)
    backbone_for = {
        "RandomPedalboardDistortion": "demucs",
        "RandomPedalboardCompressor": "demucs",
        "RandomPedalboardReverb": "dcunet",
        "RandomPedalboardChorus": "dcunet",
        "RandomPedalboardDelay": "dcunet",
    }
    small = os.environ.get("REMFX_BENCH_SMALL") == "1"  # CI smoke only
    models = {}
    for name in DEFAULT_ORDER:
        kind = backbone_for[name]
        if small:
            wrapper = make_model("tcn", nblocks=3, channel_width=8,
                                 kernel_size=3, dilation_growth=2)
        elif kind == "demucs":
            wrapper = make_model("demucs", sources=["mixture"], audio_channels=1,
                                 nfft=4096, channels=48)
        else:
            wrapper = make_model("dcunet", architecture="Large-DCUNet-20",
                                 stft_kernel_size=512, fix_length_mode="pad")
        key, sub = jax.random.split(key)
        variables = wrapper.init(sub, x[:2])
        variables = jax.tree.map(
            lambda a: a.astype(dtype) if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables)
        models[name] = (wrapper, variables)

    cls = make_cnn14(num_classes=5, sample_rate=sample_rate,
                     model_sample_rate=sample_rate, n_fft=2048,
                     hop_length=512, n_mels=128)
    key, sub = jax.random.split(key)
    cls_vars = cls.init({"params": sub}, x[:2], False)
    cls_vars = jax.tree.map(
        lambda a: a.astype(dtype) if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        cls_vars)
    x = x.astype(dtype)

    dispatch = os.environ.get("REMFX_BENCH_DISPATCH", "regroup")
    chain = ChainInference(models, sample_rate, classifier=(cls, cls_vars),
                           dispatch=dispatch)
    labels = jnp.ones((B, 5), jnp.float32)

    if dispatch == "single":
        model_vars = {k: v for k, (_, v) in models.items()}
        fn = chain._chain_fn(chain.effect_order)

        def run():
            out, _ = fn(model_vars, cls_vars, x, labels)
            return out
    elif dispatch == "regroup":
        # the reference protocol's workload: each effect present on a
        # given example w.p. ~0.5 (avg ~2.5 of 5, BASELINE.md context
        # note). Classifier detect (full cost) + host readback + per-
        # stage sub-batch regrouped removal — oracle labels stand in for
        # the detect decisions so the measured distribution is pinned.
        oracle = (jax.random.uniform(jax.random.PRNGKey(7), (B, 5)) <
                  0.5).astype(jnp.float32)
        oracle_chain = ChainInference(models, sample_rate,
                                      dispatch="regroup")

        def run():
            # classifier cost is timed (its completion is enforced by the
            # timeit sync) but dispatches async alongside the removal
            # stages — the oracle labels pin the measured distribution,
            # so no host barrier between detect and removal is needed
            probs = chain.detect(x)
            out, _ = oracle_chain._run_regrouped(
                x, oracle, oracle_chain.effect_order)
            return (probs, out)
    else:
        def run():
            out, _ = chain._run_staged(x, labels, chain.effect_order)
            return out

    dt, _ = timeit(run, iters=5, warmup=2, repeats=3)
    audio_sec = B * T / sample_rate
    rtf = audio_sec / dt
    result = {
        "metric": "chain_rtf",
        "value": round(rtf, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(rtf / 100.0, 3),
    }

    if dispatch == "regroup":
        # second row (VERDICT r3 #6): classifier-DRIVEN dispatch. The
        # counts readback must wait on the classifier output (labels
        # carry a data dependency on probs), so the measured time
        # includes the detect->host->dispatch barrier the oracle row
        # pipelines away. Label VALUES stay oracle-pinned so both rows
        # time the identical removal workload.
        def run_detect():
            probs = chain.detect(x)
            lab = oracle + 0.0 * probs  # value == oracle, dep == detect
            out, _ = oracle_chain._run_regrouped(
                x, lab, oracle_chain.effect_order)
            return out

        dt_d, _ = timeit(run_detect, iters=5, warmup=2, repeats=3)
        result["detect_driven_rtf"] = round(audio_sec / dt_d, 2)

    if os.environ.get("REMFX_BENCH_MFU", "1") == "1":
        result["mfu"] = _mfu_rows(models, cls, cls_vars, x)

    print(json.dumps(result))


# v5e (v5 lite) bf16 peak per chip; override for other parts
_PEAK_TFLOPS = float(os.environ.get("REMFX_PEAK_TFLOPS", "197"))


def _mfu_rows(models, cls, cls_vars, x):
    """Per-stage utilization (VERDICT r4 #7): for each distinct backbone
    forward, XLA's own FLOP count (compiled cost analysis) over measured
    wall time, as a fraction of v5e bf16 peak. Perf regressions then
    show up as utilization drops, not just RTF noise."""
    rows = {}
    for name, (wrapper, variables) in models.items():
        kind = getattr(wrapper, "name", None) or type(wrapper).__name__
        if kind in rows:
            continue  # one row per distinct backbone
        fn = jax.jit(lambda vv, xx, w=wrapper: w.apply(vv, xx))
        rows[kind] = _mfu_one(fn, variables, x)
    cls_fn = jax.jit(lambda v, xx: cls.apply(v, xx, False))
    rows["cnn14"] = _mfu_one(cls_fn, cls_vars, x)
    return rows


def _mfu_one(fn, variables, x):
    from remfx_tpu.utils.timing import timeit

    try:
        lowered = fn.lower(variables, x)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
    except Exception:
        flops = 0.0
    try:
        dt, _ = timeit(lambda: fn(variables, x), iters=5, warmup=2,
                       repeats=3)
    except Exception:
        return {"error": "stage timing failed"}
    row = {"ms": round(dt * 1e3, 2)}
    if flops > 0:
        tflops = flops / dt / 1e12
        row["tflops"] = round(tflops, 3)
        row["mfu"] = round(tflops / _PEAK_TFLOPS, 4)
    return row


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-stage RTF microbenchmark on the real chip: HDemucs, DCUNet, Cnn14.

Usage: python scripts/bench_stages.py [dcunet|demucs|cnn14|all]
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from remfx_tpu.utils import runtime  # noqa: E402

runtime.setup()  # REMFX_PLATFORM override + per-backend compile cache

import jax
import jax.numpy as jnp


def main():
    from remfx_tpu.models import make_cnn14, make_model
    from remfx_tpu.utils.timing import timeit

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sample_rate = 48000
    T = 262144
    B = int(os.environ.get("REMFX_BENCH_BATCH", "16"))
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = (0.1 * jax.random.normal(key, (B, 1, T), jnp.float32)).astype(dtype)
    audio_sec = B * T / sample_rate

    def bench_wrapper(name, wrapper, init_args=None):
        variables = wrapper.init(jax.random.PRNGKey(1), x[:2])
        variables = jax.tree.map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables,
        )
        fn = jax.jit(lambda v, a: wrapper.sample(v, a))
        dt, _ = timeit(fn, variables, x, iters=5, warmup=2)
        print(f"{name}: {dt*1000:.1f} ms/batch{B} -> RTF {audio_sec/dt:.0f}x")

    if which in ("dcunet", "all"):
        bench_wrapper(
            "dcunet",
            make_model("dcunet", architecture="Large-DCUNet-20",
                       stft_kernel_size=512, fix_length_mode="pad",
                       gauss_conv=os.environ.get("REMFX_GAUSS") == "1"),
        )
    if which in ("demucs", "all"):
        bench_wrapper(
            "demucs",
            make_model("demucs", sources=["mixture"], audio_channels=1,
                       nfft=4096, channels=48),
        )
    if which in ("cnn14", "all"):
        cls = make_cnn14(num_classes=5, sample_rate=sample_rate,
                         model_sample_rate=sample_rate, n_fft=2048,
                         hop_length=512, n_mels=128)
        cls_vars = cls.init({"params": jax.random.PRNGKey(2)}, x[:2], False)
        cls_vars = jax.tree.map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            cls_vars,
        )

        fn = jax.jit(lambda v, a: cls.apply(v, a, False))
        dt, _ = timeit(fn, cls_vars, x, iters=5, warmup=2)
        print(f"cnn14: {dt*1000:.1f} ms/batch{B} -> RTF {audio_sec/dt:.0f}x")


if __name__ == "__main__":
    main()

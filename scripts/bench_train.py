#!/usr/bin/env python
"""Training-step throughput on the real chip (fwd+bwd+AdamW update).

Usage: python scripts/bench_train.py [tcn|demucs|dcunet|all]
Prints ms/step and audio-sec/sec (RTF) at the paper's batch 16.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"),
)

import jax
import jax.numpy as jnp


def main():
    from remfx_tpu.models import make_model
    from remfx_tpu.train.tasks import RemovalTask
    from remfx_tpu.utils.timing import timeit

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sample_rate = 48000
    T = 262144
    B = int(os.environ.get("REMFX_BENCH_BATCH", "16"))
    key = jax.random.PRNGKey(0)
    x = 0.1 * jax.random.normal(key, (B, 1, T), jnp.float32)
    y = 0.7 * x
    audio_sec = B * T / sample_rate

    configs = {
        "tcn": dict(nblocks=20, channel_width=256, kernel_size=7,
                    dilation_growth=2),
        "demucs": dict(sources=["mixture"], audio_channels=1, nfft=4096,
                       channels=48),
        "dcunet": dict(architecture="Large-DCUNet-20", stft_kernel_size=512,
                       fix_length_mode="pad"),
    }
    names = [which] if which != "all" else list(configs)
    for name in names:
        task = RemovalTask(make_model(name, **configs[name]), max_steps=50000)
        state = task.init_state(jax.random.PRNGKey(1), x[:2])

        def step(state, k):
            return task.train_step(state, (x, y), k)

        k = jax.random.PRNGKey(2)
        dt, _ = timeit(lambda: step(state, k)[1]["train_loss"],
                       iters=3, warmup=2)
        print(f"{name}: {dt*1000:.0f} ms/step (batch {B}) -> "
              f"train RTF {audio_sec/dt:.0f}x")


if __name__ == "__main__":
    main()

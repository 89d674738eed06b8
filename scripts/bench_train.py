#!/usr/bin/env python
"""Training-step throughput on the real chip (fwd+bwd+AdamW update).

Usage: python scripts/bench_train.py [tcn|demucs|dcunet|all]
Prints ms/step and audio-sec/sec (RTF) at the paper's batch 16.
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

    # paper config (cfg/model/*.yaml). TCN's 20-block activations need
    # remat AND a smaller batch: block inputs alone are B x 262k x 256
    # bf16 (~135 MB/block/example) — the torch reference would need
    # ~86 GB for batch 16, so that config was never trainable as-is.
    configs = {
        "tcn": (dict(nblocks=20, channel_width=256, kernel_size=7,
                     dilation_growth=2, remat=True), 4),
        "demucs": (dict(sources=["mixture"], audio_channels=1, nfft=4096,
                        channels=48), B),
        # dcunet fp32 skips need ~21 GB at batch 16 — run batch 8
        # (accumulate_grad_batches=2 reproduces the effective batch)
        "dcunet": (dict(architecture="Large-DCUNet-20", stft_kernel_size=512,
                        fix_length_mode="pad"), min(B, 8)),
    }
    names = [which] if which != "all" else list(configs)
    for name in names:
        net_cfg, b = configs[name]
        xb, yb = x[:b], y[:b]
        audio_sec = b * T / sample_rate
        precision = os.environ.get("REMFX_BENCH_PRECISION", "32")
        task = RemovalTask(
            make_model(name, **net_cfg), max_steps=50000, precision=precision
        )
        state = task.init_state(jax.random.PRNGKey(1), xb[:2])

        # train_step donates the state (tasks.py donate_argnums): thread
        # the new state through or the TPU rejects the freed buffers
        cell = {"state": state}
        k = jax.random.PRNGKey(2)

        def step_once():
            new_state, metrics = task.train_step(cell["state"], (xb, yb), k)
            cell["state"] = new_state
            return metrics["train_loss"]

        dt, _ = timeit(step_once, iters=3, warmup=2)
        print(f"{name}: {dt*1000:.0f} ms/step (batch {b}) -> "
              f"train RTF {audio_sec/dt:.0f}x")


if __name__ == "__main__":
    main()

"""Probe: cost breakdown of one dynamic classifier training batch."""
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

print("devices:", jax.devices(), flush=True)
B, T, SR = 32, 262144, 48000

# 1. host synth (rich source)
from remfx_tpu.data.sources import ChunkSource
src = ChunkSource(None, "train", T, SR, synthetic=True, rich=True,
                  real_files=(str(REPO / "demos/example_48k_mono.wav"),))
rng = np.random.default_rng(0)
t0 = time.time()
chunks = np.stack([src.sample(rng) for _ in range(B)])
t_synth = time.time() - t0
print(f"host synth  B={B}: {t_synth:.2f}s", flush=True)

# 2. upload bandwidth
x = jnp.zeros((B, 1, T), jnp.float32)  # warm up alloc path
x.block_until_ready()
h = np.asarray(chunks, np.float32)
t0 = time.time()
d = jnp.asarray(h); d.block_until_ready()
t_up = time.time() - t0
mb = h.nbytes / 2**20
print(f"upload {mb:.0f} MB: {t_up:.2f}s -> {mb/t_up:.1f} MB/s", flush=True)

# 3. readback bandwidth
t0 = time.time()
_ = np.asarray(d)
t_down = time.time() - t0
print(f"readback {mb:.0f} MB: {t_down:.2f}s -> {mb/t_down:.1f} MB/s", flush=True)

# 4. device render
from remfx_tpu.augment.render import EffectChainRenderer
r = EffectChainRenderer(
    sample_rate=SR,
    effects_to_keep=(), effects_to_remove=(
        "distortion", "compressor", "reverb", "chorus", "delay"),
    num_kept_effects=(0, 0), num_removed_effects=(0, 5),
    shuffle_kept_effects=True, shuffle_removed_effects=True,
    effect_overrides={},
)
key = jax.random.PRNGKey(0)
t0 = time.time()
out = r.render_batch(key, d)
jax.block_until_ready(out)
t_render1 = time.time() - t0
t0 = time.time()
out = r.render_batch(jax.random.PRNGKey(1), d)
jax.block_until_ready(out)
t_render2 = time.time() - t0
print(f"render B={B}: first {t_render1:.1f}s, warm {t_render2:.2f}s", flush=True)

# 5. classifier train step (device-resident input)
from remfx_tpu.models import make_cnn14
from remfx_tpu.train.tasks import ClassifierTask
net = make_cnn14(num_classes=5, sample_rate=SR, n_fft=2048, hop_length=512,
                 n_mels=128, model_sample_rate=SR, specaugment=True)
task = ClassifierTask(net, lr=3e-4, lr_weight_decay=1e-3, use_mixup=False,
                      sample_rate=SR, loss_type="bce", label_smoothing=0.0,
                      gradient_clip_val=10.0)
wet = out[1]
labels = out[3]
state = task.init_state(jax.random.PRNGKey(0), wet)
t0 = time.time()
state, m = task.train_step(state, (wet, labels), jax.random.PRNGKey(2))
jax.block_until_ready(m)
t_step1 = time.time() - t0
t0 = time.time()
state, m = task.train_step(state, (wet, labels), jax.random.PRNGKey(3))
jax.block_until_ready(m)
t_step2 = time.time() - t0
print(f"cls step B={B}: first {t_step1:.1f}s, warm {t_step2:.2f}s", flush=True)
print(f"TOTAL warm dynamic step (synth+upload+render+step): "
      f"{t_synth + t_up + t_render2 + t_step2:.2f}s", flush=True)

"""Frozen-embedding classifier variants (PANNs / Wav2CLIP / VGGish /
wav2vec2).

Parity target: reference remfx/classifier.py:16-128 — a frozen HEAR
embedding model (external checkpoints: hear2021-panns_hear.pth,
wav2clip, hearbaseline vggish/wav2vec2) + a trainable 3-layer MLP head
(embed_dim -> 256 -> 256 -> num_classes).

The frozen embedding weights are external downloads (the reference pulls
them via pip packages + checkpoint files). This environment has no
network, so the embedding function is pluggable: pass any
``embed_fn(audio_16k_or_32k) -> (B, D)`` (e.g. a converted PANNs
checkpoint, or a transformers wav2vec2 once weights are present). The
MLP head + training path are fully functional and tested via a stub
embedding.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from remfx_tpu.ops.resample import resample

EMBED_DIMS = {
    "panns": 2048,  # PANNs HEAR scene embeddings @32k
    "wav2clip": 512,  # @16k
    "vggish": 128,  # @16k
    "wav2vec2": 1024,  # @16k
}
EMBED_RATES = {"panns": 32000, "wav2clip": 16000, "vggish": 16000, "wav2vec2": 16000}


class ProjHead(nn.Module):
    """The reference's trainable projection MLP."""

    num_classes: int
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, emb):
        h = nn.relu(nn.Dense(self.hidden_dim, name="fc0")(emb))
        h = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(h))
        return nn.Dense(self.num_classes, name="fc2")(h)  # logits (CE path)


class EmbeddingClassifier(nn.Module):
    """Frozen embed_fn + trainable head. Output: logits (B, num_classes)
    — the reference's non-Cnn14 classifiers return 2-d logits consumed by
    CrossEntropyLoss (quirk #9) and sigmoid-F1 metrics."""

    num_classes: int
    sample_rate: float
    embed_fn: Callable  # (B, T) resampled audio -> (B, D), frozen
    embed_rate: int = 16000
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:
            x = x.reshape(x.shape[0], -1)
        if int(self.sample_rate) != int(self.embed_rate):
            x = resample(x, int(self.sample_rate), int(self.embed_rate))
        emb = jax.lax.stop_gradient(self.embed_fn(x))
        return ProjHead(self.num_classes, self.hidden_dim, name="proj")(emb)


def make_embedding_classifier(
    kind: str,
    num_classes: int,
    sample_rate: float,
    embed_fn: Callable | None = None,
    hidden_dim: int = 256,
):
    """Build a PANNs/Wav2CLIP/VGGish/wav2vec2-style classifier.

    Without external embedding weights, pass ``embed_fn`` explicitly;
    otherwise this raises with instructions (parity with the reference's
    external-checkpoint requirement).
    """
    if embed_fn is None:
        raise RuntimeError(
            f"The {kind} classifier needs frozen embedding weights "
            "(external HEAR checkpoints, see reference remfx/classifier.py). "
            "Convert them with compat/ tools and pass embed_fn=..."
        )
    return EmbeddingClassifier(
        num_classes=num_classes,
        sample_rate=sample_rate,
        embed_fn=embed_fn,
        embed_rate=EMBED_RATES.get(kind, 16000),
        hidden_dim=hidden_dim,
    )

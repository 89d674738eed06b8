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
            # mono-sum channels like every other audio entry point
            # (reshape would concatenate channels along time)
            x = x.sum(axis=1)
        if int(self.sample_rate) != int(self.embed_rate):
            x = resample(x, int(self.sample_rate), int(self.embed_rate))
        emb = jax.lax.stop_gradient(self.embed_fn(x))
        return ProjHead(self.num_classes, self.hidden_dim, name="proj")(emb)


def make_panns_embed_fn(variables=None, seed: int = 0) -> Callable:
    """Frozen PANNs embedding = the in-repo Cnn14 trunk at 32 kHz (the
    reference's `panns_hear` scene embedder IS CNN14; remfx/
    classifier.py:16-38). ``variables``: a converted PANNs checkpoint
    (compat.convert_cnn14); without one, a fixed-seed random trunk is
    baked in — the head still trains end-to-end, but embeddings are
    untrained (documented in PARITY.md)."""
    import jax.random as jrandom

    from remfx_tpu.models.cnn14 import Cnn14

    net = Cnn14(num_classes=5, sample_rate=32000, model_sample_rate=32000)
    if variables is None:
        k = jrandom.PRNGKey(seed)
        variables = net.init(
            {"params": k, "dropout": k, "specaugment": k},
            jnp.zeros((1, 32000), jnp.float32), False,
        )

    def embed_fn(x):  # x already resampled to 32 kHz
        return net.apply(variables, x, False, method=Cnn14.embed)

    return embed_fn


def make_embedding_classifier(
    kind: str,
    num_classes: int,
    sample_rate: float,
    embed_fn: Callable | None = None,
    embed_variables=None,
    hidden_dim: int = 256,
):
    """Build a PANNs/Wav2CLIP/VGGish/wav2vec2-style classifier.

    ``panns`` is self-contained: the Cnn14 trunk at 32 kHz serves as the
    frozen embedder (optionally with converted PANNs weights via
    ``embed_variables``). The other three require external HEAR
    checkpoints the reference downloads — without network access they
    raise with instructions rather than silently substituting a
    different network.
    """
    if embed_fn is None and kind == "panns":
        embed_fn = make_panns_embed_fn(embed_variables)
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

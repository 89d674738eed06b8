"""Streaming chunked inference (chain/stream.py): fixed-signature
windows + crossfade vs whole-file processing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from remfx_tpu.chain.inference import ChainInference
from remfx_tpu.chain.stream import _windows, stream_chain
from remfx_tpu.models import make_model


def _identityish_chain(key, example, length_preserving=True):
    """One tiny removal model; length-preserving (dcunet-style) or
    valid-conv shortening (tcn)."""
    if length_preserving:
        wrapper = make_model("dcunet", architecture="Mini-DCUNet-6",
                             stft_kernel_size=64)
    else:
        wrapper = make_model("tcn", nblocks=3, channel_width=8,
                             kernel_size=3, dilation_growth=2, causal=True)
    variables = wrapper.init(key, example)
    return ChainInference(
        {"RandomPedalboardDistortion": (wrapper, variables)},
        sample_rate=48000, dispatch="staged",
    )


def test_window_coverage():
    assert _windows(100, 200, 150) == [0]
    starts = _windows(1000, 256, 192)
    assert starts[0] == 0 and starts[-1] == 1000 - 256
    covered = np.zeros(1000, bool)
    for s in starts:
        covered[s : s + 256] = True
    assert covered.all()


def test_stream_matches_whole_file_where_valid():
    """With a length-preserving model, streaming output ~ whole-file
    output away from crossfade boundaries."""
    key = jax.random.PRNGKey(0)
    chunk, overlap, T = 2048, 256, 5000
    x = np.asarray(
        0.1 * jax.random.normal(key, (1, T), jnp.float32), np.float32
    )
    chain = _identityish_chain(key, jnp.zeros((1, 1, chunk)))
    labels = np.ones(5, np.float32)

    y_stream, lab = stream_chain(chain, x, chunk=chunk, overlap=overlap,
                                 labels=labels)
    assert y_stream.shape == (1, T)
    assert np.isfinite(y_stream).all()
    np.testing.assert_array_equal(lab, labels)

    # whole-file reference through the same model (single window regions
    # must agree exactly: first window minus its faded tail)
    y_direct, _ = chain.remove(jnp.asarray(x[None, :, :chunk]),
                               jnp.asarray(labels[None]))
    y_direct = np.asarray(y_direct[0])
    np.testing.assert_allclose(
        y_stream[:, : chunk - overlap], y_direct[:, : chunk - overlap],
        atol=1e-5,
    )


def test_stream_short_input_pads_one_signature():
    key = jax.random.PRNGKey(1)
    chunk = 2048
    x = np.asarray(0.1 * jax.random.normal(key, (1, 777), jnp.float32),
                   np.float32)
    chain = _identityish_chain(key, jnp.zeros((1, 1, chunk)))
    y, _ = stream_chain(chain, x, chunk=chunk, labels=np.ones(5, np.float32))
    assert y.shape[-1] >= 777 and np.isfinite(y).all()


def test_stream_shortening_model_right_aligns():
    key = jax.random.PRNGKey(2)
    chunk, overlap, T = 1024, 128, 3000
    x = np.asarray(0.1 * jax.random.normal(key, (1, T), jnp.float32),
                   np.float32)
    chain = _identityish_chain(key, jnp.zeros((1, 1, chunk)),
                               length_preserving=False)
    y, _ = stream_chain(chain, x, chunk=chunk, overlap=overlap,
                        labels=np.ones(5, np.float32))
    assert y.shape == (1, T) and np.isfinite(y).all()
    # energy present except possibly the first (uncovered) samples
    assert np.abs(y[:, chunk:]).mean() > 0


def test_stream_use_all_effect_models_overrides_detection():
    """inference_use_all_effect_models=true must force all stages even
    when a classifier detects nothing (ADVICE r1: stream_chain parity
    with _run_staged, reference remfx/models.py:65-78)."""

    class _NeverDetects:
        classifier = object()  # truthy: takes the detect() path
        use_all_effect_models = True

        def detect(self, x):
            return jnp.zeros((x.shape[0], 5), jnp.float32)

        def remove(self, x, labels):
            self.seen_labels = np.asarray(labels)
            return x, labels

    chain = _NeverDetects()
    x = np.zeros((1, 512), np.float32)
    y, labels = stream_chain(chain, x, chunk=512)
    np.testing.assert_array_equal(labels, np.ones(5, np.float32))
    np.testing.assert_array_equal(chain.seen_labels, np.ones((1, 5), np.float32))


def test_stream_use_all_effect_models_overrides_caller_labels():
    """use_all_effect_models must also override caller-PROVIDED labels,
    matching ChainInference.forward/_run_staged/_chain_fn (reference
    remfx/models.py:65-78): batch and streamed outputs must agree for
    the same configuration and labels."""

    class _Chain:
        classifier = None
        use_all_effect_models = True

        def remove(self, x, labels):
            self.seen_labels = np.asarray(labels)
            return x, labels

    chain = _Chain()
    x = np.zeros((1, 512), np.float32)
    _, labels = stream_chain(chain, x, chunk=512,
                             labels=np.array([1, 0, 0, 0, 0], np.float32))
    np.testing.assert_array_equal(labels, np.ones(5, np.float32))
    np.testing.assert_array_equal(chain.seen_labels,
                                  np.ones((1, 5), np.float32))


def test_stream_single_window_tail_alignment():
    """T <= chunk with a length-shortening (causal TCN) model: the
    returned audio must be the chain's TAIL-aligned output for input
    samples [shift, T), not a head slice of the padded window (which
    would be shifted audio plus denoised zero-padding)."""
    key = jax.random.PRNGKey(1)
    chunk, T = 2048, 1500
    chain = _identityish_chain(key, jnp.zeros((1, 1, chunk)),
                               length_preserving=False)
    x = np.asarray(
        0.1 * jax.random.normal(key, (1, T), jnp.float32), np.float32
    )
    labels = np.ones(5, np.float32)
    y, _ = stream_chain(chain, x, chunk=chunk, overlap=256, labels=labels)

    # direct chain on the same zero-padded window (same compile shape)
    xp = np.pad(x, [(0, 0), (0, chunk - T)])
    y_direct, _ = chain.remove(jnp.asarray(xp[None]),
                               jnp.asarray(labels[None]))
    y_direct = np.asarray(y_direct[0])
    shift = chunk - y_direct.shape[-1]
    assert shift > 0, "test needs a shortening model"
    assert y.shape[-1] == T - shift
    # output index j == padded-window position shift + j
    np.testing.assert_allclose(y, y_direct[:, : T - shift], atol=1e-6)


def test_stream_rejects_degenerate_overlap():
    key = jax.random.PRNGKey(2)
    chain = _identityish_chain(key, jnp.zeros((1, 1, 1024)))
    x = np.zeros((1, 5000), np.float32)
    with pytest.raises(ValueError, match="overlap"):
        stream_chain(chain, x, chunk=1024, overlap=1024,
                     labels=np.ones(5, np.float32))
    with pytest.raises(ValueError, match="overlap"):
        stream_chain(chain, x, chunk=1024, overlap=2048,
                     labels=np.ones(5, np.float32))

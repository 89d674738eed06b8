"""Chunked streaming inference for arbitrary-length files.

The reference processes a whole file as one tensor (remfx_detect.py:
44-54) — fine under torch's eager kernels, but under XLA every distinct
input length is a fresh multi-minute compile, and very long files blow
past HBM. Here long audio runs through the chain in fixed-size
overlapping windows (ONE compile signature) recombined by linear
crossfade overlap-add; detection runs once on the loudest window so the
whole file gets a consistent effect set, mirroring the reference's
single whole-file classifier call.
"""

from __future__ import annotations

import numpy as np

from remfx_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _windows(T: int, chunk: int, hop: int) -> list[int]:
    """Window start offsets covering [0, T) with the last window
    right-aligned so no tail is lost."""
    if T <= chunk:
        return [0]
    starts = list(range(0, T - chunk, hop))
    starts.append(T - chunk)
    return starts


def stream_chain(chain, x: np.ndarray, chunk: int = 262144,
                 overlap: int = 16384, labels=None):
    """x: (C, T) arbitrary length -> (y (C, T'), labels (5,)).

    * T <= chunk: zero-pad to ``chunk`` (one signature), crop back.
    * else: detect once on the highest-energy window, then run the
      removal stages window-by-window with those labels and crossfade.
    T' == T unless the chain's models shorten outputs (published
    backbones preserve length).
    """
    import jax.numpy as jnp

    C, T = x.shape
    # overlap only shapes the hop when windowing actually happens;
    # a short input (T <= chunk) is one zero-padded window regardless
    if T > chunk and not 0 <= overlap < chunk:
        raise ValueError(
            f"overlap={overlap} must satisfy 0 <= overlap < chunk={chunk} "
            "(hop would be zero/negative and windows would skip audio)"
        )
    starts = _windows(T, chunk, chunk - overlap)
    frames = np.stack([x[:, s : s + min(chunk, T)] for s in starts])
    if frames.shape[-1] < chunk:
        frames = np.pad(frames, [(0, 0), (0, 0), (0, chunk - frames.shape[-1])])

    # ---- detect once (classifier or provided labels) ----
    if labels is None:
        if chain.classifier is not None:
            energies = np.mean(frames**2, axis=(1, 2))
            probe = jnp.asarray(frames[int(np.argmax(energies))][None])
            labels = np.asarray(chain.detect(probe))[0]
        else:
            labels = np.ones(5, np.float32)
    labels = np.asarray(labels, np.float32)
    # inference_use_all_effect_models parity with _run_staged / _chain_fn
    # (reference remfx/models.py:65-78): apply every stage regardless of
    # detected OR caller-provided labels, matching the batch paths
    if getattr(chain, "use_all_effect_models", False):
        labels = np.ones_like(labels)

    # ---- removal per window, same labels (ONE compile signature) ----
    lab = jnp.asarray(np.tile(labels[None], (1, 1)))
    outs = []
    for i in range(frames.shape[0]):
        y, _ = chain.remove(jnp.asarray(frames[i][None]), lab)
        outs.append(np.asarray(y[0], np.float32))
    out_len = outs[0].shape[-1]  # == chunk for length-preserving models
    # length-shortening models (valid-conv TCN) causal-crop to the
    # window's TAIL, so each output right-aligns at s + chunk
    shift = chunk - out_len

    if len(starts) == 1:
        # tail-aligned: output index j is padded-window position
        # shift + j, so input samples [shift, T) live at out[:, :T-shift]
        # (head-slicing would return audio shifted by `shift` plus
        # denoised zero-padding)
        n = T - shift
        if n <= 0:
            raise ValueError(
                f"input length {T} is shorter than the chain's receptive "
                f"field ({shift} samples are cropped)"
            )
        return outs[0][:, :n], labels

    # ---- crossfade overlap-add ----
    y = np.zeros((C, T), np.float32)
    w = np.zeros((1, T), np.float32)
    ramp = np.linspace(0.0, 1.0, overlap, dtype=np.float32)
    for i, s in enumerate(starts):
        s2 = s + shift
        n = min(out_len, T - s2)
        if n <= 0:
            continue
        win = np.ones(n, np.float32)
        if i > 0 and n > overlap:
            win[:overlap] = ramp[:overlap]
        if i < len(starts) - 1 and n > overlap:
            win[-overlap:] = np.minimum(win[-overlap:], ramp[::-1])
        y[:, s2 : s2 + n] += outs[i][:, :n] * win
        w[:, s2 : s2 + n] += win
    return y / np.maximum(w, 1e-8), labels

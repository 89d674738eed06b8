"""The vendored trained checkpoint (ckpts/tcn_distortion_synth, trained
on real TPU — BASELINE.md "Trained models") must stay loadable and must
actually denoise: its output on a distorted synthetic batch must beat
the input SI-SDR. Guards the artifact + the load path used by
scripts/bench_trained_chain.py and chain inference (reference analogue:
per-effect ckpt map, scripts/chain_inference.py:19-27)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CKPT = Path(__file__).resolve().parents[1] / "ckpts" / "tcn_distortion_synth"

pytestmark = pytest.mark.skipif(not CKPT.is_dir(), reason="no vendored ckpt")


def test_trained_tcn_loads_and_denoises():
    from remfx_tpu.augment.render import EffectChainRenderer
    from remfx_tpu.data.sources import synthetic_chunk
    from remfx_tpu.losses import si_sdr
    from remfx_tpu.train.checkpoint import load_trained_wrapper
    from remfx_tpu.utils.crop import causal_crop

    effect, wrapper, variables = load_trained_wrapper(str(CKPT))
    assert effect == "distortion"

    import json

    hp = json.loads((CKPT / "hparams.json").read_text())
    renderer = EffectChainRenderer(
        48000,
        effects_to_remove=("distortion",),
        num_removed_effects=(1, 1),
        effect_overrides=hp["effects"],
    )
    rng = np.random.default_rng(0)
    T = 32768  # ~4x the TCN receptive field; enough post-crop signal
    clean = jnp.asarray(np.stack(
        [synthetic_chunk(rng, T, 48000) for _ in range(4)]))
    dry, wet, _, _ = renderer.render_batch(jax.random.PRNGKey(3), clean)

    out = wrapper.sample(variables, wet)
    Tm = out.shape[-1]
    dry_c = causal_crop(dry, Tm)
    wet_c = causal_crop(wet, Tm)
    in_sisdr = float(jnp.mean(si_sdr(wet_c, dry_c)))
    out_sisdr = float(jnp.mean(si_sdr(out, dry_c)))
    assert np.isfinite(out_sisdr)
    assert out_sisdr > in_sisdr + 1.0, (
        f"trained ckpt no longer denoises: {out_sisdr:.2f} <= {in_sisdr:.2f}"
    )


UMX_CKPT = Path(__file__).resolve().parents[1] / "ckpts" / "umx_reverb_synth"


@pytest.mark.skipif(not UMX_CKPT.is_dir(), reason="no vendored ckpt")
def test_trained_umx_reverb_loads_and_dereverbs():
    """Vendored params-only (bf16) UMX reverb checkpoint: must restore
    through the variables/ layout and, with the Wiener-EM post-filter
    (niter=1, the configuration whose held-out test SI-SDR beats the
    input baseline — BASELINE.md), must improve SI-SDR on a reverbed
    synthetic batch."""
    from remfx_tpu.augment.render import EffectChainRenderer
    from remfx_tpu.data.sources import synthetic_chunk
    from remfx_tpu.losses import si_sdr
    from remfx_tpu.train.checkpoint import load_trained_wrapper

    import json

    effect, wrapper, variables = load_trained_wrapper(str(UMX_CKPT), niter=1)
    assert effect == "reverb"
    # bf16 round-trip: params restored upcast to fp32
    assert variables["params"]["model"]["fc1"]["weight"].dtype == np.float32

    hp = json.loads((UMX_CKPT / "hparams.json").read_text())
    renderer = EffectChainRenderer(
        48000,
        effects_to_remove=("reverb",),
        num_removed_effects=(1, 1),
        effect_overrides=hp["effects"],
    )
    rng = np.random.default_rng(1)
    T = 65536  # the training chunk size (BiLSTM context)
    clean = jnp.asarray(np.stack(
        [synthetic_chunk(rng, T, 48000) for _ in range(4)]))
    dry, wet, _, _ = renderer.render_batch(jax.random.PRNGKey(5), clean)

    out = wrapper.sample(variables, wet)
    in_sisdr = float(jnp.mean(si_sdr(wet, dry)))
    out_sisdr = float(jnp.mean(si_sdr(out, dry)))
    assert np.isfinite(out_sisdr)
    assert out_sisdr > in_sisdr, (
        f"trained ckpt no longer dereverbs: {out_sisdr:.2f} <= {in_sisdr:.2f}"
    )


AUG_CKPT = Path(__file__).resolve().parents[1] / "ckpts" / "tcn_distortion_aug"


@pytest.mark.skipif(not AUG_CKPT.is_dir(), reason="no vendored ckpt")
def test_trained_aug_tcn_denoises_with_kept_effect():
    """FXAug checkpoint (trained with effects_to_keep = the other 4,
    reference cfg/exp/distortion_aug.yaml): must improve SI-SDR on a
    distorted batch even when an untreated second effect is present in
    BOTH dry and wet — the in-distribution scenario chain composition
    relies on (BASELINE.md "Trained chain composition")."""
    import json

    from remfx_tpu.augment.render import EffectChainRenderer
    from remfx_tpu.data.sources import synthetic_chunk
    from remfx_tpu.losses import si_sdr
    from remfx_tpu.train.checkpoint import load_trained_wrapper
    from remfx_tpu.utils.crop import causal_crop

    effect, wrapper, variables = load_trained_wrapper(str(AUG_CKPT))
    assert effect == "distortion"

    hp = json.loads((AUG_CKPT / "hparams.json").read_text())
    renderer = EffectChainRenderer(
        48000,
        effects_to_keep=tuple(hp["effects_to_keep"]),
        effects_to_remove=("distortion",),
        num_kept_effects=(1, 1),
        num_removed_effects=(1, 1),
        shuffle_kept_effects=True,
        effect_overrides=hp["effects"],
    )
    rng = np.random.default_rng(7)
    T = 32768
    clean = jnp.asarray(np.stack(
        [synthetic_chunk(rng, T, 48000) for _ in range(4)]))
    dry, wet, _, _ = renderer.render_batch(jax.random.PRNGKey(11), clean)

    out = wrapper.sample(variables, wet)
    Tm = out.shape[-1]
    dry_c = causal_crop(dry, Tm)
    wet_c = causal_crop(wet, Tm)
    in_sisdr = float(jnp.mean(si_sdr(wet_c, dry_c)))
    out_sisdr = float(jnp.mean(si_sdr(out, dry_c)))
    assert np.isfinite(out_sisdr)
    assert out_sisdr > in_sisdr + 0.5, (
        f"aug ckpt no longer denoises with kept effects: "
        f"{out_sisdr:.2f} <= {in_sisdr:.2f}"
    )

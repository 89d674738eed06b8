"""Config system (L5) tests: experiment registry, CLI overrides, env
vars — the cfg/ + Hydra surface (SURVEY.md §2.8) without Hydra."""

import os

import pytest

from remfx_tpu.config.core import default_config, parse_cli
from remfx_tpu.config.experiments import EXPERIMENTS, MODEL_CONFIGS

# the reference's 27 cfg/exp names (SURVEY.md §2.8)
REFERENCE_EXPERIMENTS = [
    "chorus", "delay", "reverb", "distortion", "compression",
    "chorus_aug", "delay_aug", "reverb_aug", "distortion_aug",
    "compression_aug",
    "0-0", "1-1", "2-2", "3-3", "4-4", "5-5", "5-1", "5-5_full", "default",
    "5-5_full_cls", "5-5_full_cls_dynamic",
    "chain_inference", "chain_inference_aug", "chain_inference_aug_classifier",
    "chain_inference_custom", "remfx_oracle", "remfx_detect", "remfx_all",
]


def test_all_reference_experiments_registered():
    missing = [n for n in REFERENCE_EXPERIMENTS if n not in EXPERIMENTS]
    assert not missing, f"experiments missing from registry: {missing}"


@pytest.mark.parametrize("name", REFERENCE_EXPERIMENTS)
def test_experiment_configs_compose(name):
    cfg = parse_cli([f"+exp={name}"])
    assert cfg["sample_rate"] == 48000 and cfg["chunk_size"] == 262144
    assert cfg["seed"] == 12345  # reference cfg/config.yaml:7
    if name.endswith("_cls") or name.endswith("_cls_dynamic"):
        assert cfg["model"]["task"] == "classifier"
    if name.startswith("remfx_") or name.startswith("chain_inference"):
        assert "ckpts" in cfg and len(cfg["ckpts"]) == 5
        assert list(cfg["inference_effects_ordering"])
    if name == "remfx_all":
        assert cfg["inference_use_all_effect_models"] is True
    if name == "remfx_detect":
        assert cfg.get("classifier") is not None


def test_dotted_overrides_and_literals():
    cfg = parse_cli([
        "+exp=distortion",
        "datamodule.train_batch_size=4",
        "trainer.max_steps=100",
        "num_removed_effects=[2,3]",
        "model.network.nblocks=5",
        "log_audio=false",
        "ckpt_path=null",
    ])
    assert cfg["datamodule"]["train_batch_size"] == 4
    assert cfg["trainer"]["max_steps"] == 100
    assert cfg["num_removed_effects"] == [2, 3]
    assert cfg["model"]["network"]["nblocks"] == 5
    assert cfg["log_audio"] is False and cfg["ckpt_path"] is None


def test_dataset_root_env(monkeypatch):
    monkeypatch.setenv("DATASET_ROOT", "/tmp/somewhere")
    cfg = parse_cli(["+exp=distortion"])
    assert cfg["dataset_root"] == "/tmp/somewhere"


def test_effect_override_surface_matches_reference():
    """cfg/effects/all.yaml ranges, incl. the max_delay_sconds typo
    (reference effects.py:346 — config-facing API)."""
    cfg = default_config()
    eff = cfg["effects"]
    assert set(eff) == {"chorus", "distortion", "compressor", "reverb",
                        "delay"}
    assert eff["delay"]["max_delay_sconds"] == 1.0
    assert eff["distortion"] == {"min_drive_db": 8.0, "max_drive_db": 25.0}
    assert eff["compressor"]["min_threshold_db"] == -42.0


def test_model_config_registry():
    # 5 removal + classifier variants (cfg/model/*, SURVEY.md §2.8)
    for required in ("demucs", "dcunet", "umx", "dptnet", "tcn"):
        assert required in MODEL_CONFIGS, required
        assert MODEL_CONFIGS[required]["task"] == "removal"
    cls_variants = [k for k in MODEL_CONFIGS if k.startswith("cls_")]
    assert len(cls_variants) >= 5, cls_variants


def test_unknown_experiment_exits():
    with pytest.raises(SystemExit):
        parse_cli(["+exp=not_a_real_experiment"])


def test_hydra_style_bare_word_lists():
    """Hydra accepts `effects_to_remove=[distortion,compressor]` with
    unquoted words (reference CLI surface); so must parse_cli."""
    from remfx_tpu.config.core import _parse_value, parse_cli

    assert _parse_value("[distortion]") == ["distortion"]
    assert _parse_value("[distortion, compressor]") == [
        "distortion", "compressor"]
    assert _parse_value("[0,1]") == [0, 1]
    assert _parse_value("[]") == []
    cfg = parse_cli(["+exp=5-5_full_cls", "effects_to_remove=[delay]",
                     "num_removed_effects=[0,1]", "logs_dir=/tmp/x"])
    assert cfg["effects_to_remove"] == ["delay"]
    assert cfg["num_removed_effects"] == [0, 1]
    # nested bare-word lists split only at top-level commas
    assert _parse_value("[[distortion],[chorus,delay]]") == [
        ["distortion"], ["chorus", "delay"]]
    assert _parse_value("[(0,1),(2,3)]") == [(0, 1), (2, 3)]


def test_cli_overrides_do_not_mutate_model_registry():
    """Dotted model overrides write through a deep copy: a second
    parse_cli in the same process must see pristine MODEL_CONFIGS."""
    from remfx_tpu.config.experiments import MODEL_CONFIGS

    before = MODEL_CONFIGS["dcunet"]["network"].copy()
    parse_cli(["+exp=reverb", "model.network.architecture=DCUNet-10",
               "logs_dir=/tmp/x"])
    assert MODEL_CONFIGS["dcunet"]["network"] == before
    cfg2 = parse_cli(["+exp=chorus", "logs_dir=/tmp/x"])
    assert cfg2["model"]["network"].get("architecture") != "DCUNet-10"

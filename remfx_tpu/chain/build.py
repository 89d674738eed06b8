"""Construct a ChainInference system from a chain-experiment config
(the cfg/exp/remfx_{oracle,detect,all}.yaml surface).

Missing checkpoints are a hard error by default — a results-producing
eval must never silently run random-init models (the reference's
load_state_dict crashes the same way). Set REMFX_ALLOW_RANDOM_CKPT=1
for smoke/bench runs that intentionally use random weights."""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp

from remfx_tpu.chain.inference import ChainInference
from remfx_tpu.models import make_cnn14, make_model
from remfx_tpu.train.checkpoint import restore_from
from remfx_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _load_variables(ckpt_path: str, template, what: str):
    """Orbax directory OR published torch .ckpt file -> variables.

    A torch file (Zenodo download, reference scripts/download_ckpts.sh)
    is converted in memory via compat.torch_import and structure-checked
    against the module's init tree, so `ckpts/demucs_distortion_aug.ckpt`
    works verbatim as the reference configs write it."""
    p = Path(ckpt_path)
    if p.is_file():
        from remfx_tpu.compat.torch_import import (
            check_structure,
            import_torch_checkpoint,
        )

        kind, variables = import_torch_checkpoint(str(p))
        check_structure(variables, jax.device_get(template))
        log.info("imported torch checkpoint %s (%s) for %s", p, kind, what)
        return jax.tree.map(jnp.asarray, variables)
    variables = restore_from(str(p), template)
    log.info("loaded %s from %s", what, p)
    return variables


def build_chain(cfg: dict, example_x) -> ChainInference:
    key = jax.random.PRNGKey(cfg["seed"])
    models = {}
    for class_name, spec in cfg.get("ckpts", {}).items():
        model_name = spec["model"] if isinstance(spec["model"], str) else (
            spec["model"].get("name")
        )
        net_cfg = {}
        if isinstance(spec["model"], dict):
            net_cfg = spec["model"].get("network", {})
        from remfx_tpu.config.experiments import MODEL_CONFIGS

        if model_name in MODEL_CONFIGS and not net_cfg:
            net_cfg = MODEL_CONFIGS[model_name].get("network", {})
            base_name = MODEL_CONFIGS[model_name]["name"]
        else:
            base_name = model_name
        ckpt_path = spec.get("ckpt_path")
        if ckpt_path and Path(ckpt_path, "hparams.json").is_file():
            # vendored in-repo checkpoint (ckpts/<name>/, see
            # scripts/vendor_ckpt.py): its hparams define the wrapper —
            # the spec's model entry is superseded so one chain config
            # can mix Zenodo .ckpt files and vendored trained runs
            from remfx_tpu import EFFECT_CLASS_NAMES
            from remfx_tpu.train.checkpoint import load_trained_wrapper

            effect, wrapper, variables = load_trained_wrapper(ckpt_path)
            want = EFFECT_CLASS_NAMES.get(class_name)
            if want is not None and effect != want:
                raise ValueError(
                    f"vendored ckpt {ckpt_path} removes {effect!r} but is "
                    f"mapped to {class_name} ({want!r})"
                )
            log.info("loaded vendored %s from %s", class_name, ckpt_path)
            models[class_name] = (wrapper, variables)
            continue
        wrapper = make_model(base_name, sample_rate=cfg["sample_rate"], **net_cfg)
        key, sub = jax.random.split(key)
        variables = wrapper.init(sub, example_x)
        if ckpt_path and Path(ckpt_path).exists():
            variables = _load_variables(ckpt_path, variables, class_name)
        elif os.environ.get("REMFX_ALLOW_RANDOM_CKPT") == "1":
            log.warning("checkpoint %s missing for %s — using random init",
                        ckpt_path, class_name)
        else:
            raise FileNotFoundError(
                f"checkpoint {ckpt_path} missing for {class_name}; run "
                "scripts/download_ckpts.sh + compat converters, or set "
                "REMFX_ALLOW_RANDOM_CKPT=1 for a random-weights smoke run"
            )
        models[class_name] = (wrapper, variables)

    classifier = None
    if cfg.get("classifier") is not None:
        ckpt = cfg.get("classifier_ckpt")
        if ckpt and Path(ckpt, "hparams.json").is_file():
            # vendored trained classifier (detect-mode artifact)
            from remfx_tpu.train.checkpoint import load_trained_classifier

            net, cls_vars = load_trained_classifier(ckpt)
            log.info("loaded vendored classifier from %s", ckpt)
            return _finish_chain(cfg, models, (net, cls_vars))
        net = make_cnn14(
            num_classes=cfg["num_classes"],
            sample_rate=cfg["sample_rate"],
            **cfg["classifier"].get("network", {}),
        )
        key, sub = jax.random.split(key)
        cls_vars = net.init({"params": sub}, example_x, False)
        if ckpt and Path(ckpt).exists():
            cls_vars = _load_variables(ckpt, cls_vars, "classifier")
        elif os.environ.get("REMFX_ALLOW_RANDOM_CKPT") == "1":
            log.warning("classifier ckpt %s missing — using random init", ckpt)
        else:
            raise FileNotFoundError(
                f"classifier checkpoint {ckpt} missing; set "
                "REMFX_ALLOW_RANDOM_CKPT=1 for a random-weights smoke run"
            )
        classifier = (net, cls_vars)

    return _finish_chain(cfg, models, classifier)


def _finish_chain(cfg: dict, models, classifier) -> ChainInference:
    from remfx_tpu.chain.inference import DEFAULT_ORDER

    order = tuple(cfg.get("inference_effects_ordering", ())) or DEFAULT_ORDER
    return ChainInference(
        models,
        sample_rate=cfg["sample_rate"],
        effect_order=order,
        classifier=classifier,
        shuffle_effect_order=cfg.get("inference_effects_shuffle", False),
        use_all_effect_models=cfg.get("inference_use_all_effect_models", False),
        seed=int(cfg.get("seed", 0)),
    )

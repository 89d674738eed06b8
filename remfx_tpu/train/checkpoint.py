"""Checkpoint save/restore via orbax.

Parity target: Lightning ModelCheckpoint behavior (reference
cfg/config.yaml:31-40): monitor a metric, keep top-1 ("best") + always
save "last"; resume via explicit path (scripts/test.py:20-23).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, monitor: str = "valid_loss", mode: str = "min"):
        self.dir = Path(ckpt_dir).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.best = None
        self._ckptr = ocp.StandardCheckpointer()

    def _is_better(self, value: float) -> bool:
        if self.best is None:
            return True
        return value < self.best if self.mode == "min" else value > self.best

    def _save(self, name: str, state):
        # Crash-safe replace: write beside the live checkpoint, then swap
        # via renames, so a preemption mid-save (the event auto-resume
        # exists to survive) never leaves `name` missing or half-written.
        # Orbax itself finalizes `tmp` atomically, so if `tmp` exists as
        # a directory it is complete.
        final = self.dir / name
        tmp = self.dir / f"{name}.tmp"
        old = self.dir / f"{name}.old"
        for p in (tmp, old):
            if p.exists():
                shutil.rmtree(p)
        self._ckptr.save(tmp, jax.device_get(state))
        self._ckptr.wait_until_finished()
        if final.exists():
            final.rename(old)
        tmp.rename(final)
        if old.exists():
            shutil.rmtree(old)

    def save_last(self, state, step: int, epoch: int = 0,
                  run_tag: str | None = None):
        self._save("last", state)
        (self.dir / "last_meta.json").write_text(
            json.dumps({"step": step, "epoch": epoch, "run_tag": run_tag})
        )

    def maybe_save_best(self, state, metrics: dict, step: int) -> bool:
        if self.monitor not in metrics:
            return False
        value = float(metrics[self.monitor])
        if self._is_better(value):
            self.best = value
            self._save("best", state)
            (self.dir / "best_meta.json").write_text(
                json.dumps({"step": step, self.monitor: value})
            )
            return True
        return False

    def restore(self, state_like, name: str = "best"):
        path = self.dir / name
        return self._ckptr.restore(path, jax.device_get(state_like))


def find_latest_run(logs_dir: str):
    """Newest timestamped ckpt dir under ``logs_dir/ckpts`` that holds a
    completed "last" save, or None. Enables preemption auto-resume
    (upgrade over the reference, which only has save_last + a manual
    ckpt_path, cfg/config.yaml:36, scripts/test.py:20-23)."""
    root = Path(logs_dir) / "ckpts"
    if not root.is_dir():
        return None
    runs = sorted(
        (d for d in root.iterdir() if (d / "last_meta.json").is_file()),
        key=lambda d: d.name,
        reverse=True,
    )
    for d in runs:
        if _repair_last(d):
            return d
    return None


def _repair_last(run_dir: Path) -> bool:
    """Finish an interrupted `last` swap (see CheckpointManager._save):
    prefer a completed `.tmp` (newer), fall back to `.old` (one save
    stale), and report whether a usable `last` exists."""
    last = run_dir / "last"
    if not last.is_dir():
        for cand in (run_dir / "last.tmp", run_dir / "last.old"):
            if cand.is_dir():
                cand.rename(last)
                break
    return last.is_dir()


def restore_from(path: str, state_like):
    """Restore from an explicit checkpoint directory path."""
    return ocp.StandardCheckpointer().restore(
        Path(path).resolve(), jax.device_get(state_like)
    )


def restore_tree(path: str):
    """Template-free restore: the checkpoint's raw pytree (numpy
    leaves). Used by warm_start to lift params/batch_stats out of a
    donor checkpoint WITHOUT assuming the donor's optimizer structure —
    a full-TrainState template fails on structure mismatch when the
    donor trained under a different optax wrapper (e.g. MultiSteps from
    accumulate_grad_batches>1; round-2 ADVICE low)."""
    return ocp.StandardCheckpointer().restore(Path(path).resolve())


def save_trained_variables(out_dir: str, variables, half_params: bool = True):
    """Vendor inference variables params-only (``variables/`` orbax dir):
    dropping the AdamW moments and storing params in bfloat16 cuts a
    vendored checkpoint ~5x (UMX: 67 MB TrainState -> 13 MB) — the
    repo carries learning evidence, not resume state. batch_stats stay
    fp32 (BN running stats are cheap and precision-sensitive)."""
    import jax.numpy as jnp

    d = Path(out_dir).resolve()  # orbax requires absolute paths
    d.mkdir(parents=True, exist_ok=True)
    v = dict(jax.device_get(variables))
    if half_params and "params" in v:
        v["params"] = jax.tree.map(
            lambda a: np.asarray(a, jnp.bfloat16)
            if getattr(a, "dtype", None) == np.float32 else a,
            v["params"],
        )
    ckptr = ocp.StandardCheckpointer()
    target = d / "variables"
    if target.exists():
        shutil.rmtree(target)
    ckptr.save(target, v)
    ckptr.wait_until_finished()


def load_trained_wrapper(ckpt_dir: str, **network_overrides):
    """Load a vendored trained checkpoint (``hparams.json`` + either a
    params-only ``variables/`` orbax dir (save_trained_variables) or a
    full TrainState ``best/`` dir as written by the train loop, e.g.
    ``ckpts/tcn_distortion_synth``).

    Returns ``(effect_name, wrapper, variables)`` ready for
    ``ChainInference`` / ``wrapper.sample``.  The per-effect checkpoint
    map mirrors the reference's ``cfg.ckpts`` loading
    (scripts/chain_inference.py:19-27).  ``network_overrides`` tweak
    inference-only module fields (e.g. ``niter=1`` for the UMX
    Wiener-EM post-filter) without touching the param tree.
    """
    import jax.numpy as jnp

    from remfx_tpu.models import make_model
    from remfx_tpu.train.tasks import RemovalTask

    d = Path(ckpt_dir)
    hp = json.loads((d / "hparams.json").read_text())
    m = hp["model"]
    tr = hp.get("trainer", {})
    net_cfg = dict(m.get("network", {}))
    net_cfg.update(network_overrides)
    wrapper = make_model(m["name"], sample_rate=hp["sample_rate"], **net_cfg)
    if (d / "variables").is_dir():
        raw = ocp.StandardCheckpointer().restore(
            (d / "variables").resolve()
        )
        # upcast vendored bf16 params back to the fp32 compute dtype
        variables = dict(raw)
        variables["params"] = jax.tree.map(
            lambda a: np.asarray(a, np.float32)
            if getattr(a, "dtype", None) == jnp.bfloat16 else a,
            raw["params"],
        )
    else:
        task = RemovalTask(
            wrapper,
            max_steps=tr.get("max_steps", 100),
            accumulate_grad_batches=tr.get("accumulate_grad_batches", 1),
        )
        x0 = jnp.zeros((1, 1, 16384), jnp.float32)
        state = task.init_state(jax.random.PRNGKey(0), x0)
        state = restore_from(str(d / "best"), state)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
    effects = hp.get("effects_to_remove") or []
    assert len(effects) == 1, f"expected single-effect ckpt, got {effects}"
    return effects[0], wrapper, variables


def load_trained_classifier(ckpt_dir: str, **network_overrides):
    """Load a vendored trained CLASSIFIER checkpoint (same ``ckpts/``
    layout as load_trained_wrapper but the hparams carry a
    ``task: classifier`` model config). Returns ``(net, variables)``
    ready for ``ChainInference(classifier=...)`` — the detect-mode
    artifact the reference ships as ``classifier.ckpt``
    (scripts/download_ckpts.sh:8)."""
    import jax.numpy as jnp

    from remfx_tpu.models import make_cnn14

    d = Path(ckpt_dir)
    hp = json.loads((d / "hparams.json").read_text())
    m = hp["model"]
    assert m.get("task") == "classifier", f"not a classifier ckpt: {ckpt_dir}"
    net_cfg = dict(m.get("network", {}))
    net_cfg.update(network_overrides)
    net = make_cnn14(num_classes=hp.get("num_classes", 5),
                     sample_rate=hp["sample_rate"], **net_cfg)
    raw = ocp.StandardCheckpointer().restore((d / "variables").resolve())
    variables = dict(raw)
    variables["params"] = jax.tree.map(
        lambda a: np.asarray(a, np.float32)
        if getattr(a, "dtype", None) == jnp.bfloat16 else a,
        raw["params"],
    )
    return net, variables

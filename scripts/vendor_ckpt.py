#!/usr/bin/env python
"""Vendor a training run's best checkpoint into the compact ``ckpts/``
layout consumed by ``load_trained_wrapper`` / ``bench_trained_chain``:

    ckpts/<name>/
        hparams.json   (copied from the run's logger dir)
        metrics.csv    (training curve evidence)
        variables/     (params-only orbax, bf16 params, fp32 batch_stats)

Usage:
    REMFX_PLATFORM=cpu python scripts/vendor_ckpt.py <run_logs_dir> <out_dir>

The run dir is a ``logs_dir`` as written by train.loop.fit: it contains
``ckpts/<timestamp>/best`` (full TrainState) and
``remfx_tpu/version_0/{hparams.json,metrics.csv}``.  Mirrors what the
reference publishes per Zenodo checkpoint (weights + recipe,
reference scripts/download_ckpts.sh:7-11) without the optimizer state.
"""

import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from remfx_tpu.utils import runtime  # noqa: E402

runtime.setup()


def main():
    run_dir = Path(sys.argv[1])
    out_dir = Path(sys.argv[2])

    import jax
    import jax.numpy as jnp

    from remfx_tpu.models import make_model
    from remfx_tpu.train import tasks as task_mod
    from remfx_tpu.train.checkpoint import (
        restore_from,
        save_trained_variables,
    )

    versions = sorted(run_dir.glob("remfx_tpu/version_*/hparams.json"))
    assert versions, f"no hparams.json under {run_dir}"
    hp = json.loads(versions[-1].read_text())
    runs = sorted((run_dir / "ckpts").iterdir())
    assert runs, f"no ckpts under {run_dir}"
    best = runs[-1] / "best"
    assert best.is_dir(), f"no best checkpoint in {runs[-1]}"

    m = hp["model"]
    if m.get("task") == "classifier":
        from remfx_tpu.models import make_cnn14

        wrapper_or_clf = make_cnn14(
            num_classes=hp.get("num_classes", 5),
            sample_rate=hp["sample_rate"], **m.get("network", {}),
        )
        task = task_mod.ClassifierTask(
            wrapper_or_clf,
            use_mixup=m.get("mixup", False),
            sample_rate=hp["sample_rate"],
        )
        x0 = jnp.zeros((2, 1, 48000), jnp.float32)
    else:
        wrapper_or_clf = make_model(m["name"], sample_rate=hp["sample_rate"],
                                    **m.get("network", {}))
        task = task_mod.RemovalTask(
            wrapper_or_clf,
            max_steps=hp["trainer"].get("max_steps", 100) or 100,
            accumulate_grad_batches=hp["trainer"].get(
                "accumulate_grad_batches", 1),
        )
        x0 = jnp.zeros((1, 1, 16384), jnp.float32)
    state = task.init_state(jax.random.PRNGKey(0), x0)
    state = restore_from(str(best), state)

    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats

    out_dir.mkdir(parents=True, exist_ok=True)
    save_trained_variables(str(out_dir), variables)
    shutil.copy(versions[-1], out_dir / "hparams.json")
    metrics = versions[-1].parent / "metrics.csv"
    if metrics.exists():
        shutil.copy(metrics, out_dir / "metrics.csv")
    meta = runs[-1] / "best_meta.json"
    if meta.exists():
        shutil.copy(meta, out_dir / "best_meta.json")
    print(f"vendored {best} -> {out_dir}")


if __name__ == "__main__":
    main()

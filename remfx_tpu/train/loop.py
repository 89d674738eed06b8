"""Fit/test driver — the Lightning-Trainer role, config-driven.

Mirrors the reference's train path (scripts/train.py:9-55): seed ->
datamodule (rendering side-effect) -> model/task -> fit with per-step
logging, validation each epoch, best/last checkpointing -> test with the
best checkpoint.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu.data.datasets import (
    DynamicEffectDataset,
    EffectDataset,
    EffectDatamodule,
    InferenceDataset,
)
from remfx_tpu.models import make_cnn14, make_model
from remfx_tpu.train.checkpoint import (
    CheckpointManager,
    find_latest_run,
    restore_from,
    restore_tree,
)
from remfx_tpu.train.loggers import make_logger
from remfx_tpu.train.tasks import ClassifierTask, RemovalTask
from remfx_tpu.utils import heartbeat
from remfx_tpu.utils.logging import get_logger

log = get_logger(__name__)


def build_datamodule(cfg: dict) -> EffectDatamodule:
    dm = cfg["datamodule"]
    common = dict(
        root=cfg.get("dataset_root"),
        sample_rate=cfg["sample_rate"],
        chunk_size=cfg["chunk_size"],
        effects_to_keep=cfg["effects_to_keep"] or [],
        effects_to_remove=cfg["effects_to_remove"] or [],
        num_kept_effects=cfg["num_kept_effects"],
        num_removed_effects=cfg["num_removed_effects"],
        shuffle_kept_effects=cfg["shuffle_kept_effects"],
        shuffle_removed_effects=cfg["shuffle_removed_effects"],
        effect_overrides=cfg.get("effects"),
        seed=cfg["seed"],
        synthetic=dm.get("synthetic", False),
        # multi-family synthetic sources (plucks/drums/mixtures + vendored
        # real clips) — the classifier's domain-gap lever (VERDICT r3 #3)
        synthetic_rich=dm.get("synthetic_rich", False),
        synthetic_real_files=dm.get("synthetic_real_files", ()),
    )
    dstype = dm.get("dataset_type", "offline")
    if dstype == "inference":
        ds = InferenceDataset(root=cfg.get("dataset_root"),
                              sample_rate=cfg["sample_rate"])
        return EffectDatamodule(ds, ds, ds,
                                train_batch_size=dm["train_batch_size"],
                                test_batch_size=dm["test_batch_size"],
                                seed=cfg["seed"])
    if dstype == "dynamic":
        dev_res = dm.get("device_resident", "auto")
        if dev_res == "auto":
            # fresh renders feed a jitted consumer; leaving them in HBM
            # avoids the tunneled backend's 0.5 MB/s readback. On CPU the
            # conversion is free either way — keep numpy for test parity.
            dev_res = jax.default_backend() != "cpu"
        train = DynamicEffectDataset(
            total_chunks=dm.get("train_chunks", 8000), mode="train",
            device_resident=bool(dev_res), **common
        )
    else:
        train = EffectDataset(
            total_chunks=dm.get("train_chunks", 8000),
            mode="train",
            render_files=cfg["render_files"],
            render_root=cfg["render_root"],
            render_batch_size=dm.get("render_batch_size", 8),
            **common,
        )
    val = EffectDataset(
        total_chunks=dm.get("val_chunks", 1000), mode="val",
        render_files=cfg["render_files"], render_root=cfg["render_root"],
        render_batch_size=dm.get("render_batch_size", 8), **common,
    )
    test = EffectDataset(
        total_chunks=dm.get("test_chunks", 1000), mode="test",
        render_files=cfg["render_files"], render_root=cfg["render_root"],
        render_batch_size=dm.get("render_batch_size", 8), **common,
    )
    return EffectDatamodule(
        train, val, test,
        train_batch_size=dm["train_batch_size"],
        test_batch_size=dm["test_batch_size"],
        seed=cfg["seed"],
    )


def build_task(cfg: dict):
    m = cfg["model"]
    if m is None:
        raise SystemExit("no model configured; pass +exp=NAME or model=...")
    if m["task"] == "classifier":
        if m.get("name") == "embedding":
            from remfx_tpu.models.embedding_classifiers import (
                make_embedding_classifier,
            )

            net = make_embedding_classifier(
                m["network"]["kind"],
                num_classes=cfg["num_classes"],
                sample_rate=cfg["sample_rate"],
            )
        else:
            net = make_cnn14(
                num_classes=cfg["num_classes"],
                sample_rate=cfg["sample_rate"],
                **m.get("network", {}),
            )
        return ClassifierTask(
            net,
            lr=m.get("lr", 3e-4),
            lr_weight_decay=m.get("lr_weight_decay", 1e-3),
            use_mixup=m.get("mixup", False),
            sample_rate=cfg["sample_rate"],
            loss_type=m.get("loss_type", "bce"),
            label_smoothing=m.get("label_smoothing", 0.0),
            gradient_clip_val=cfg["trainer"].get("gradient_clip_val", 10.0),
        )
    wrapper = make_model(m["name"], sample_rate=cfg["sample_rate"],
                         **m.get("network", {}))
    return RemovalTask(
        wrapper,
        lr=m.get("lr", 1e-4),
        lr_beta1=m.get("lr_beta1", 0.95),
        lr_beta2=m.get("lr_beta2", 0.999),
        lr_eps=m.get("lr_eps", 1e-6),
        lr_weight_decay=m.get("lr_weight_decay", 1e-3),
        max_steps=cfg["trainer"]["max_steps"],
        gradient_clip_val=cfg["trainer"].get("gradient_clip_val", 10.0),
        sample_rate=cfg["sample_rate"],
        accumulate_grad_batches=cfg["trainer"].get(
            "accumulate_grad_batches", 1
        ),
        precision=cfg["trainer"].get("precision", "32"),
    )


def _adapt_batch(task, batch):
    wet, dry, dry_labels, wet_labels = batch
    if isinstance(task, ClassifierTask):
        return wet, wet_labels
    return wet, dry


def build_mesh(cfg: dict):
    """trainer.devices > 1 -> a dp x tp Mesh (SURVEY §2.10 upgrade: the
    reference parses trainer.devices but is single-device only). Returns
    None for the single-device path."""
    devices = int(cfg["trainer"].get("devices", 1) or 1)
    tp = int(cfg["trainer"].get("tensor_parallel", 1) or 1)
    if devices <= 1:
        return None
    from remfx_tpu.parallel import make_mesh

    avail = jax.devices()
    if devices > len(avail):
        raise ValueError(
            f"trainer.devices={devices} but only {len(avail)} devices present"
        )
    # mesh over exactly the requested subset (Lightning 'use N of M')
    return make_mesh(dp=devices // tp, tp=tp, devices=avail[:devices])


def _shard_state(state, mesh):
    from remfx_tpu.parallel import replicate, shard_params_channels

    state = replicate(state, mesh)
    if mesh.shape["tp"] > 1:
        state = state.replace(
            params=shard_params_channels(state.params, mesh)
        )
    return state


def _shard(batch, mesh, strict=True):
    if mesh is None:
        return batch
    from remfx_tpu.parallel import replicate, shard_batch

    B = batch[0].shape[0]
    dp = mesh.shape["dp"]
    if B % dp:
        if strict and B >= dp:
            # ragged tail batch of an epoch: drop-last semantics (the
            # torch DataLoader equivalent) — trim to a dp multiple so
            # per-device shapes stay static; shuffling rotates which
            # examples fall in the tail each epoch
            keep = (B // dp) * dp
            if not getattr(_shard, "_warned_trim", False):
                _shard._warned_trim = True
                log.warning(
                    "trimming ragged batch %d -> %d (dp=%d, drop-last)",
                    B, keep, dp,
                )
            return shard_batch(tuple(x[:keep] for x in batch), mesh)
        # batches smaller than the mesh — replicate instead
        return replicate(batch, mesh)
    return shard_batch(batch, mesh)


def _mean_logs(rows: list[dict]) -> dict:
    if not rows:
        return {}
    keys = rows[0].keys()
    return {k: float(np.mean([float(r[k]) for r in rows])) for k in keys}


def evaluate(task, state, loader, prefix="valid", log_audio_to=None,
             sample_rate=48000, step=0, mesh=None):
    rows = []
    first = True
    for batch in loader:
        b = _shard(_adapt_batch(task, batch), mesh, strict=False)
        metrics = task.eval_step(state, b, prefix)
        rows.append(metrics)
        if first and log_audio_to is not None and not isinstance(task, ClassifierTask):
            # AudioCallback parity (reference remfx/callbacks.py:45-83):
            # log [pred, 2 s silence, input, 2 s silence, target]
            from remfx_tpu.utils.crop import causal_crop

            x, y = b
            pred = np.asarray(task.wrapper.sample(task._variables(state), x)[0])
            silence = np.zeros((pred.shape[0], 2 * sample_rate), pred.dtype)
            # shortened outputs are tail-aligned (wrapper contract):
            # causal-crop input/target like the loss path, not head-slice
            xc = np.asarray(causal_crop(x[0], pred.shape[-1]))
            yc = np.asarray(causal_crop(y[0], pred.shape[-1]))
            concat = np.concatenate(
                [pred, silence, xc, silence, yc], axis=-1
            )
            log_audio_to.log_audio(f"{prefix}_pred_input_target", concat,
                                   sample_rate, step)
        first = False
    out = _mean_logs(rows)
    # expose epoch-style alias used by classifier checkpointing configs
    if f"{prefix}_avg_acc" in out:
        out[f"{prefix}_avg_acc_epoch"] = out[f"{prefix}_avg_acc"]
    return out


def _run_tag(cfg: dict) -> str:
    """Experiment identity stamped into last_meta.json so auto_resume
    never restores a same-architecture checkpoint from a DIFFERENT
    experiment that happens to share logs_dir."""
    m = cfg.get("model") or {}
    return "|".join([
        str(m.get("name")), str(m.get("task")),
        ",".join(sorted(cfg.get("effects_to_remove") or [])),
        ",".join(sorted(cfg.get("effects_to_keep") or [])),
    ])


def _maybe_device_cache(cfg: dict, task, datamodule):
    """Wrap offline datasets in a device-resident HBM cache (see
    DeviceCachedDataset): eliminates the per-step host->device batch
    upload that dominates tunneled-backend training (3.1 s/step vs
    0.33 s compute, DCUNet batch 8). ``datamodule.device_cache``:
    true | false | "auto" (default: on for offline datasets on a
    non-cpu backend when the audio fits a 6 GB HBM budget)."""
    import jax

    mode = cfg["datamodule"].get("device_cache", "auto")
    if mode is False or cfg["datamodule"].get("dataset_type") == "inference":
        return
    backend = jax.default_backend()
    keep_dry = not isinstance(task, ClassifierTask)
    from remfx_tpu.data import DeviceCachedDataset, EffectDataset

    for attr in ("train_dataset", "val_dataset", "test_dataset"):
        ds = getattr(datamodule, attr, None)
        if not isinstance(ds, EffectDataset):
            continue  # dynamic datasets already render on device
        bytes_est = (
            len(ds) * ds.chunk_size * 2 * (2 if keep_dry else 1)
        )
        if mode == "auto" and (
            backend == "cpu" or bytes_est > 6 * 1024**3
        ):
            continue
        log.info("device-caching %s (%d chunks, ~%d MB bf16)",
                 attr, len(ds), bytes_est // 2**20)
        setattr(datamodule, attr, DeviceCachedDataset(ds, keep_dry=keep_dry))


def fit(cfg: dict):
    import jax.random as jrandom

    datamodule = build_datamodule(cfg)
    task = build_task(cfg)
    _maybe_device_cache(cfg, task, datamodule)
    key = jrandom.PRNGKey(cfg["seed"])

    # init from one example batch
    first_batch = next(iter(datamodule.train_dataloader()))
    x0, _ = _adapt_batch(task, first_batch)
    key, k_init = jrandom.split(key)
    state = task.init_state(k_init, x0)
    start_step = 0
    start_epoch = 0
    resume_best = None
    prior = None
    if cfg.get("ckpt_path"):
        state = restore_from(cfg["ckpt_path"], state)
        log.info("restored checkpoint from %s", cfg["ckpt_path"])
    else:
        meta = None
        if cfg["trainer"].get("auto_resume"):
            # preemption recovery (SURVEY §5.3 upgrade): resume from the
            # newest "last" checkpoint in this logs_dir, keeping the step
            # counter and best-metric watermark. Checked BEFORE
            # warm_start: a preempted warm-started fine-tune relaunched
            # with the same CLI must resume its OWN progress, not
            # silently re-warm-start from the donor at step 0 (round-2
            # ADVICE medium)
            prior = find_latest_run(cfg["logs_dir"])
            if prior is not None:
                meta = json.loads((prior / "last_meta.json").read_text())
                # a run_tag mismatch means the newest ckpt in this
                # logs_dir belongs to a DIFFERENT experiment (same-
                # architecture foreign weights would restore without
                # error and skip training entirely at step >= max_steps)
                tag = meta.get("run_tag")
                if tag is not None and tag != _run_tag(cfg):
                    log.warning(
                        "auto_resume: newest checkpoint %s is from a "
                        "different run (%s != %s); starting fresh",
                        prior, tag, _run_tag(cfg),
                    )
                    prior = None
        if prior is None and cfg.get("warm_start"):
            # fine-tuning init: take params (+ batch_stats) from a donor
            # checkpoint but keep a FRESH optimizer/step — unlike
            # ckpt_path, the restored optax count does not fast-forward
            # the LR milestone schedule (0.8/0.95 * max_steps) past the
            # whole run. Template-free restore: the donor's optimizer
            # structure (e.g. MultiSteps wrapping) need not match ours.
            donor = restore_tree(cfg["warm_start"])
            # vendored donors store bf16 params (save_trained_variables
            # halves them for repo size); master weights must stay the
            # template's fp32 or AdamW runs on bf16 masters silently
            cast = jax.tree.map(
                lambda d, t: jnp.asarray(d, t.dtype), donor["params"],
                state.params,
            )
            state = state.replace(
                params=cast,
                batch_stats=donor.get("batch_stats", state.batch_stats),
            )
            log.info("warm-started params from %s", cfg["warm_start"])
        if prior is not None:
            state = restore_from(str(prior / "last"), state)
            start_step = meta.get("step", 0)
            start_epoch = meta.get("epoch", 0)
            bm = prior / "best_meta.json"
            if bm.is_file():
                resume_best = json.loads(bm.read_text())
            log.info("auto-resumed from %s at step %d epoch %d",
                     prior, start_step, start_epoch)
            # continue the data sequence instead of replaying epoch 1..N
            # shuffle orders / dynamic re-renders (+1: the init batch
            # above already consumed one dataloader call)
            if hasattr(datamodule, "set_epoch"):
                datamodule.set_epoch(start_epoch + 1)
    mesh = build_mesh(cfg)
    if mesh is not None:
        state = _shard_state(state, mesh)
        log.info("multi-device training: mesh %s", dict(mesh.shape))

    logger = make_logger(cfg.get("logger", "csv"), cfg["logs_dir"])
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    logger.log_hyperparams({**cfg, "model/params/total": n_params,
                            "model/params/trainable": n_params})
    log.info("model parameters: %s", f"{n_params:,}")
    mc = cfg["callbacks"]["model_checkpoint"]
    ckpts = CheckpointManager(
        Path(cfg["logs_dir"]) / "ckpts" / time.strftime("%Y-%m-%d-%H-%M-%S"),
        monitor=mc.get("monitor", "valid_loss"),
        mode=mc.get("mode", "min"),
    )
    if resume_best is not None and ckpts.monitor in resume_best:
        ckpts.best = float(resume_best[ckpts.monitor])

    max_steps = cfg["trainer"]["max_steps"]
    if max_steps is None or max_steps < 0:  # Lightning: -1 = unlimited
        max_steps = float("inf")
    max_epochs = cfg["trainer"].get("max_epochs", -1)
    log_every = cfg["trainer"].get("log_every_n_steps", 1)
    # Lightning counts OPTIMIZER steps against max_steps: with
    # accumulate_grad_batches=k each counted step consumes k micro-batches
    # (optax.MultiSteps applies the inner update on the k-th), keeping the
    # LR milestone schedule (0.8/0.95 * max_steps) aligned.
    accum = getattr(task, "accumulate_grad_batches", 1)
    step = start_step
    # after a mid-cycle resume the restored optax.MultiSteps may hold a
    # nonzero mini_step; seed the micro counter from it so `step`
    # increments exactly when the inner optimizer applies an update
    mini = getattr(state.opt_state, "mini_step", None)
    micro = int(mini) % accum if (accum > 1 and mini is not None) else 0
    # epoch resumes too, so max_epochs bounds TOTAL epochs across
    # preemptions (Lightning semantics), not per-process epochs
    epoch = start_epoch
    t0 = time.time()
    if cfg.get("profile"):
        # first-class jax.profiler trace capture (SURVEY §5.1 upgrade)
        jax.profiler.start_trace(str(Path(cfg["logs_dir"]) / "profile"))
    while step < max_steps and (max_epochs < 0 or epoch < max_epochs):
        for batch in datamodule.train_dataloader():
            b = _shard(_adapt_batch(task, batch), mesh)
            key, k_step = jrandom.split(key)
            state, metrics = task.train_step(state, b, k_step)
            heartbeat.beat()  # liveness for scripts/supervise.py
            micro += 1
            if micro % accum:
                continue
            step += 1
            if step % log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["steps_per_sec"] = (step - start_step) / (
                    time.time() - t0)
                logger.log_metrics(metrics, step)
            if step >= max_steps:
                break
        epoch += 1
        val_metrics = evaluate(
            task, state, datamodule.val_dataloader(), "valid",
            log_audio_to=logger if cfg.get("log_audio") else None,
            sample_rate=cfg["sample_rate"], step=step, mesh=mesh,
        )
        logger.log_metrics(val_metrics, step)
        log.info("epoch %d step %d: %s", epoch, step,
                 {k: round(v, 4) for k, v in val_metrics.items()})
        ckpts.maybe_save_best(state, val_metrics, step)
        # save_last moves the FULL TrainState (params + both Adam
        # moments) host-side per call — ~1 GB for Cnn14 over the remote
        # device tunnel, which can dwarf the epoch's compute. The knob
        # trades preemption-recovery granularity for wall clock; the
        # final epoch always saves so a completed run is resumable.
        save_every = int(
            cfg["trainer"].get("save_last_every_n_epochs", 1) or 1)
        last_epoch = step >= max_steps or (
            max_epochs > 0 and epoch >= max_epochs)
        if epoch % save_every == 0 or last_epoch:
            ckpts.save_last(state, step, epoch, run_tag=_run_tag(cfg))

    if cfg.get("profile"):
        jax.profiler.stop_trace()

    # test with best (reference: trainer.test(ckpt_path="best"))
    try:
        state = ckpts.restore(state, "best")
    except Exception:
        if prior is not None and (prior / "best").exists():
            # resumed run never improved on the prior best
            state = restore_from(str(prior / "best"), state)
        else:
            log.warning("no best checkpoint; testing final state")
    if mesh is not None:
        # restore() returns host-resident arrays; re-apply the dp/tp
        # placement before the sharded eval (test() already does this)
        state = _shard_state(state, mesh)
    test_metrics = evaluate(task, state, datamodule.test_dataloader(), "test",
                            mesh=mesh)
    logger.log_metrics(test_metrics, step)
    log.info("test: %s", {k: round(v, 4) for k, v in test_metrics.items()})
    logger.close()
    return state, test_metrics


def test(cfg: dict):
    datamodule = build_datamodule(cfg)
    task = build_task(cfg)
    first_batch = next(iter(datamodule.test_dataloader()))
    x0, _ = _adapt_batch(task, first_batch)
    state = task.init_state(jax.random.PRNGKey(cfg["seed"]), x0)
    if cfg.get("ckpt_path"):
        state = restore_from(cfg["ckpt_path"], state)
    mesh = build_mesh(cfg)
    if mesh is not None:
        state = _shard_state(state, mesh)
    logger = make_logger(cfg.get("logger", "csv"), cfg["logs_dir"])
    metrics = evaluate(task, state, datamodule.test_dataloader(), "test",
                       mesh=mesh)
    logger.log_metrics(metrics, 0)
    log.info("test: %s", {k: round(v, 4) for k, v in metrics.items()})
    logger.close()
    return metrics

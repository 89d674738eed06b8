"""End-to-end smoke: tiny TCN removal train + Cnn14 classifier train on a
synthetic dynamic dataset (no downloads), through the config system,
exactly like `python scripts/train.py +exp=... datamodule.synthetic=true`.
"""

import numpy as np
import pytest

from remfx_tpu.config.core import parse_cli
from remfx_tpu.train.loop import fit

pytestmark = pytest.mark.slow


def _tiny_overrides():
    return [
        "datamodule.synthetic=true",
        "datamodule.dataset_type=dynamic",
        "datamodule.train_chunks=4",
        "datamodule.val_chunks=2",
        "datamodule.test_chunks=2",
        "datamodule.train_batch_size=2",
        "datamodule.test_batch_size=2",
        "trainer.max_steps=4",
        "trainer.max_epochs=2",
        "chunk_size=8192",
    ]


def test_tcn_removal_train_smoke(tmp_path):
    cfg = parse_cli(
        ["+exp=distortion", "model.name=tcn",
         "model.network.nblocks=4", "model.network.channel_width=8",
         "model.network.kernel_size=3", "model.network.dilation_growth=2",
         f"logs_dir={tmp_path}"] + _tiny_overrides()
    )
    # dynamic dataset serves train; val/test EffectDataset render to disk
    cfg["render_root"] = str(tmp_path / "data")
    state, metrics = fit(cfg)
    assert "test_loss" in metrics and np.isfinite(metrics["test_loss"])
    assert "test_SISDR" in metrics and "Input_SISDR" in metrics
    # checkpoints + csv exist
    assert any((tmp_path / "ckpts").rglob("best")), "best checkpoint missing"
    csvs = list(tmp_path.rglob("metrics.csv"))
    assert csvs and csvs[0].stat().st_size > 0


def test_classifier_train_smoke(tmp_path):
    cfg = parse_cli(
        ["+exp=5-5_full_cls", f"logs_dir={tmp_path}",
         "model.network.specaugment=true"] + _tiny_overrides()
    )
    cfg["render_root"] = str(tmp_path / "data")
    # keep the chain cheap: only distortion+compressor candidates
    cfg["effects_to_remove"] = ["distortion", "compressor"]
    cfg["num_removed_effects"] = [0, 2]
    state, metrics = fit(cfg)
    assert "test_avg_acc" in metrics and np.isfinite(metrics["test_avg_acc"])
    # nan loss once silently passed while probs were nan (short-clip
    # pooling collapse); keep the loss asserted finite
    assert np.isfinite(metrics["test_loss"]), metrics


def test_wandb_logger_offline_fallback(tmp_path):
    """WandbLogger degrades to JSONL + CSV when wandb is absent."""
    import json

    from remfx_tpu.train.loggers import WandbLogger, make_logger

    lg = make_logger("wandb", str(tmp_path))
    assert isinstance(lg, WandbLogger)
    lg.log_hyperparams({"a": 1})
    lg.log_metrics({"loss": 2.5}, step=1)
    lg.log_audio("probe", np.zeros((1, 100), np.float32), 48000, 1)
    lg.close()
    events = [json.loads(l) for l in
              (lg.dir / "events.jsonl").read_text().splitlines()]
    kinds = [e["kind"] for e in events]
    assert kinds == ["hparams", "metrics", "audio"]
    assert (lg.dir / "metrics.csv").stat().st_size > 0
    assert list((lg.dir / "audio").glob("*.wav"))


def test_grad_accumulation_every_k():
    """accumulate_grad_batches=k: params move only every k-th step
    (optax.MultiSteps; trainer parity with cfg/config.yaml:116)."""
    import jax
    import jax.numpy as jnp

    from remfx_tpu.models import make_model
    from remfx_tpu.train.tasks import RemovalTask

    w = make_model("tcn", nblocks=2, channel_width=8, kernel_size=3,
                   dilation_growth=2)
    task = RemovalTask(w, max_steps=100, accumulate_grad_batches=2)
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4096),
                                jnp.float32)
    s0 = task.init_state(jax.random.PRNGKey(1), x)
    p0 = jax.tree.map(lambda a: a.copy(), s0.params)
    s1, _ = task.train_step(s0, (x, 0.5 * x), jax.random.PRNGKey(2))
    # first micro-batch: grads accumulated, params unchanged
    same = jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.allclose(a, b)), p0, s1.params))
    assert same, "params must not move on the first of 2 micro-batches"
    s2, _ = task.train_step(s1, (x, 0.5 * x), jax.random.PRNGKey(3))
    moved = not jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.allclose(a, b)), p0, s2.params))
    assert moved, "params must update after k accumulated micro-batches"


def test_accumulation_counts_optimizer_steps_and_lr_drop_fires():
    """With accumulate_grad_batches=k, max_steps counts OPTIMIZER steps
    (fit() consumes k micro-batches per counted step) and the MultiStepLR
    milestones at 0.8/0.95*max_steps are actually reached — Lightning
    parity (ADVICE r1 medium)."""
    import jax
    import jax.numpy as jnp

    from remfx_tpu.models import make_model
    from remfx_tpu.train.tasks import RemovalTask

    w = make_model("tcn", nblocks=2, channel_width=8, kernel_size=3,
                   dilation_growth=2)
    max_steps, k = 6, 2
    task = RemovalTask(w, lr=1e-2, max_steps=max_steps,
                       accumulate_grad_batches=k)
    assert task.accumulate_grad_batches == k
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4096),
                                jnp.float32)
    state = task.init_state(jax.random.PRNGKey(1), x)
    key = jax.random.PRNGKey(2)

    def flat(p):
        return jnp.concatenate([a.ravel() for a in jax.tree.leaves(p)])

    # fit()-style loop: step advances every k micro-batches
    deltas = {}
    step = micro = 0
    while step < max_steps:
        prev = flat(state.params)
        key, sk = jax.random.split(key)
        state, _ = task.train_step(state, (x, 0.5 * x), sk)
        micro += 1
        if micro % k:
            continue
        step += 1
        deltas[step] = float(jnp.linalg.norm(flat(state.params) - prev))

    assert micro == max_steps * k
    # inner (optimizer) update count drives the schedule
    assert int(state.opt_state.gradient_step) == max_steps
    # milestones int(0.8*6)=4, int(0.95*6)=5 → by opt step 6 the schedule
    # count (5) has crossed both drops: update magnitude ~1000x smaller.
    # Adam's unit-scaled updates make ||delta|| track the LR closely.
    assert deltas[6] < 0.1 * deltas[2], (
        f"LR drop never fired: {deltas}"
    )


def test_cls_panns_pt_end_to_end(tmp_path):
    """`cls_panns_pt` is self-contained: Cnn14 trunk @32k as the frozen
    PANNs embedder + trainable MLP head, CE/multilabel-F1 path
    (VERDICT r1 #7)."""
    cfg = parse_cli(
        ["+exp=5-5_full_cls", "model=cls_panns_pt",
         f"logs_dir={tmp_path}"] + _tiny_overrides()
    )
    cfg["render_root"] = str(tmp_path / "data")
    cfg["effects_to_remove"] = ["distortion"]
    cfg["num_removed_effects"] = [0, 1]
    state, metrics = fit(cfg)
    assert "test_avg_acc" in metrics and np.isfinite(metrics["test_avg_acc"])
    assert np.isfinite(metrics["test_loss"]), metrics
    assert state.batch_stats is None  # head-only params, frozen trunk


def test_external_embedding_classifiers_fail_loudly():
    """cls_vggish / cls_wav2clip / cls_wav2vec2 must raise with
    instructions instead of silently aliasing Cnn14 (VERDICT r1 #4
    'misleading aliases')."""
    import pytest

    from remfx_tpu.train.loop import build_task

    for name in ("cls_vggish", "cls_wav2clip", "cls_wav2vec2"):
        cfg = parse_cli(["+exp=5-5_full_cls", f"model={name}",
                         "logs_dir=/tmp/x"] + _tiny_overrides())
        with pytest.raises(RuntimeError, match="external HEAR"):
            build_task(cfg)


def test_auto_resume_from_last(tmp_path):
    """trainer.auto_resume resumes step counter + params from the newest
    "last" checkpoint in logs_dir (preemption recovery, SURVEY §5.3)."""
    import jax

    base = [
        "+exp=distortion", "model.name=tcn",
        "model.network.nblocks=3", "model.network.channel_width=8",
        "model.network.kernel_size=3", "model.network.dilation_growth=2",
        f"logs_dir={tmp_path}",
    ] + _tiny_overrides()
    cfg = parse_cli(base + ["trainer.max_steps=2", "trainer.max_epochs=1"])
    cfg["render_root"] = str(tmp_path / "data")
    state1, _ = fit(cfg)

    import logging

    from remfx_tpu.train.checkpoint import find_latest_run

    cfg2 = parse_cli(base + ["trainer.max_steps=3", "trainer.max_epochs=2",
                             "trainer.auto_resume=true",
                             "render_files=false"])
    cfg2["render_root"] = str(tmp_path / "data")
    records = []
    h = logging.Handler()
    h.emit = lambda r: records.append(r.getMessage())
    logging.getLogger("remfx_tpu.train.loop").addHandler(h)
    try:
        state2, metrics2 = fit(cfg2)
    finally:
        logging.getLogger("remfx_tpu.train.loop").removeHandler(h)
    assert any("auto-resumed" in m and "step 2" in m for m in records), records
    assert np.isfinite(metrics2["test_loss"])
    import json as _json

    last = find_latest_run(str(tmp_path))
    meta = _json.loads((last / "last_meta.json").read_text())
    assert meta["step"] == 3, meta
    # epoch persists across preemptions so max_epochs bounds TOTAL epochs:
    # run 1 ended at epoch 1, the resume starts there, not at 0
    assert any("auto-resumed" in m and "epoch 1" in m for m in records), records
    assert meta["epoch"] == 2, meta


def test_find_latest_run_repairs_interrupted_save(tmp_path):
    """A preemption mid-`last` swap (CheckpointManager._save) must not
    wedge auto-resume: find_latest_run finishes the swap from the
    completed `.tmp` (or the one-save-stale `.old`) and skips runs with
    no usable `last` at all."""
    from remfx_tpu.train.checkpoint import find_latest_run

    root = tmp_path / "ckpts"
    # newest run: killed between `last`->`last.old` and `tmp`->`last`
    r2 = root / "2026-01-02-00-00-00"
    r2.mkdir(parents=True)
    (r2 / "last_meta.json").write_text('{"step": 7}')
    (r2 / "last.tmp").mkdir()
    (r2 / "last.tmp" / "d").write_text("new")
    (r2 / "last.old").mkdir()
    found = find_latest_run(str(tmp_path))
    assert found == r2
    assert (r2 / "last" / "d").read_text() == "new"
    assert not (r2 / "last.tmp").exists()

    # only a stale `.old` survives: still resumable
    r3 = root / "2026-01-03-00-00-00"
    r3.mkdir()
    (r3 / "last_meta.json").write_text('{"step": 9}')
    (r3 / "last.old").mkdir()
    (r3 / "last.old" / "d").write_text("old")
    assert find_latest_run(str(tmp_path)) == r3
    assert (r3 / "last" / "d").read_text() == "old"

    # meta but no checkpoint directory at all: fall back to older run
    r4 = root / "2026-01-04-00-00-00"
    r4.mkdir()
    (r4 / "last_meta.json").write_text('{"step": 11}')
    assert find_latest_run(str(tmp_path)) == r3


def test_atomic_last_save_layout(tmp_path):
    """_save leaves exactly `last` (no tmp/old residue) and the previous
    checkpoint is replaced only after the new one is fully written."""
    import jax.numpy as jnp

    from remfx_tpu.train.checkpoint import CheckpointManager

    cm = CheckpointManager(str(tmp_path / "run"), monitor="valid_loss")
    state = {"w": jnp.arange(4, dtype=jnp.float32)}
    cm.save_last(state, step=1)
    cm.save_last({"w": jnp.arange(4, dtype=jnp.float32) * 2}, step=2)
    d = tmp_path / "run"
    assert (d / "last").is_dir()
    assert not (d / "last.tmp").exists()
    assert not (d / "last.old").exists()
    restored = cm.restore(state, "last")
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.arange(4, dtype=np.float32) * 2)


def test_resume_seeds_micro_from_multisteps_mini_step():
    """fit()'s micro counter is seeded from the restored MultiSteps
    mini_step so a mid-accumulation-cycle resume keeps the counted
    optimizer steps aligned with actual parameter updates."""
    import jax
    import jax.numpy as jnp

    from remfx_tpu.models import make_model
    from remfx_tpu.train.tasks import RemovalTask

    w = make_model("tcn", nblocks=2, channel_width=8, kernel_size=3,
                   dilation_growth=2)
    task = RemovalTask(w, max_steps=100, accumulate_grad_batches=2)
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4096),
                                jnp.float32)
    state = task.init_state(jax.random.PRNGKey(1), x)
    assert int(state.opt_state.mini_step) == 0
    state, _ = task.train_step(state, (x, 0.5 * x), jax.random.PRNGKey(2))
    # mid-cycle: one of two micro-batches accumulated
    assert int(state.opt_state.mini_step) == 1
    # the loop's seeding expression (train/loop.py)
    micro = int(getattr(state.opt_state, "mini_step")) % 2
    assert micro == 1


def test_classifier_gradient_clip_applied():
    """The trainer's global-norm clip applies to the classifier optimizer
    too (reference cfg/exp/5-5_full_cls.yaml:59 sets
    gradient_clip_val: 10.0). Adam normalizes scale, so the observable
    effect of a ~0 clip norm is grads drowned by Adam's eps: the step
    must be orders of magnitude smaller than with a no-op clip."""
    import jax
    import jax.numpy as jnp
    import optax

    from remfx_tpu.models import make_cnn14
    from remfx_tpu.train.tasks import ClassifierTask

    def step_norm(clip):
        net = make_cnn14(num_classes=5, sample_rate=4800,
                         model_sample_rate=4800, n_fft=256, hop_length=128,
                         n_mels=32)
        task = ClassifierTask(net, lr=1e-2, lr_weight_decay=0.0,
                              gradient_clip_val=clip)
        x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4800),
                                    jnp.float32)
        labels = jnp.ones((2, 5), jnp.float32)
        s0 = task.init_state(jax.random.PRNGKey(1), x)
        p0 = jax.tree.map(lambda a: a.copy(), s0.params)  # step donates s0
        s1, _ = task.train_step(s0, (x, labels), jax.random.PRNGKey(2))
        return float(optax.global_norm(jax.tree.map(lambda a, b: a - b,
                                                    s1.params, p0)))

    tiny, free = step_norm(1e-12), step_norm(1e12)
    assert tiny < 1e-3 * free, (tiny, free)


def test_warm_start_params_only(tmp_path):
    """cfg.warm_start fine-tuning init: donor params are restored but the
    optimizer/step start fresh, so the LR milestone schedule (keyed on the
    optax update count) is NOT fast-forwarded past the run — unlike
    ckpt_path, which restores the full TrainState including step."""
    import logging

    base = [
        "+exp=distortion", "model.name=tcn",
        "model.network.nblocks=3", "model.network.channel_width=8",
        "model.network.kernel_size=3", "model.network.dilation_growth=2",
    ] + _tiny_overrides()
    cfg = parse_cli(base + [f"logs_dir={tmp_path / 'a'}",
                            "trainer.max_steps=2", "trainer.max_epochs=1"])
    cfg["render_root"] = str(tmp_path / "data")
    state1, _ = fit(cfg)
    best = next((tmp_path / "a" / "ckpts").rglob("best"))

    cfg2 = parse_cli(base + [f"logs_dir={tmp_path / 'b'}",
                             f"warm_start={best.resolve()}",
                             "trainer.max_steps=1", "trainer.max_epochs=1",
                             "render_files=false"])
    cfg2["render_root"] = str(tmp_path / "data")
    records = []
    h = logging.Handler()
    h.emit = lambda r: records.append(r.getMessage())
    logging.getLogger("remfx_tpu.train.loop").addHandler(h)
    try:
        state2, metrics2 = fit(cfg2)
    finally:
        logging.getLogger("remfx_tpu.train.loop").removeHandler(h)
    assert any("warm-started" in m for m in records), records
    assert np.isfinite(metrics2["test_loss"])
    # fresh optimizer: run b performed exactly 1 update from the donor
    # params — step is 1, not donor_step + 1
    assert int(state2.step) == 1, int(state2.step)
    # and it really did start from the donor's weights: one small step
    # away, not a fresh init (norms differ from a PRNG init by far less)
    d_donor = float(optax_global_norm_diff(state2.params, state1.params))
    assert d_donor < 1.0, d_donor


def optax_global_norm_diff(p, q):
    import jax
    import optax

    return optax.global_norm(jax.tree.map(lambda a, b: a - b, p, q))


def test_auto_resume_skips_foreign_run_tag(tmp_path):
    """auto_resume must not restore a same-architecture checkpoint from
    a DIFFERENT experiment sharing logs_dir (it would restore cleanly
    and skip training at step >= max_steps)."""
    import logging

    base = [
        "model.name=tcn",
        "model.network.nblocks=3", "model.network.channel_width=8",
        "model.network.kernel_size=3", "model.network.dilation_growth=2",
        f"logs_dir={tmp_path}",
    ] + _tiny_overrides()
    cfg = parse_cli(["+exp=distortion"] + base +
                    ["trainer.max_steps=2", "trainer.max_epochs=1"])
    cfg["render_root"] = str(tmp_path / "data")
    fit(cfg)

    cfg2 = parse_cli(["+exp=chorus", "model=tcn"] + base +
                     ["trainer.max_steps=1", "trainer.max_epochs=1",
                      "model.network.nblocks=3",
                      "model.network.channel_width=8",
                      "model.network.kernel_size=3",
                      "model.network.dilation_growth=2",
                      "trainer.auto_resume=true"])
    cfg2["render_root"] = str(tmp_path / "data")
    records = []
    h = logging.Handler()
    h.emit = lambda r: records.append(r.getMessage())
    logging.getLogger("remfx_tpu.train.loop").addHandler(h)
    try:
        fit(cfg2)
    finally:
        logging.getLogger("remfx_tpu.train.loop").removeHandler(h)
    assert any("starting fresh" in m for m in records), records
    assert not any("auto-resumed" in m for m in records), records


def test_auto_resume_outranks_warm_start(tmp_path):
    """A preempted warm-started fine-tune relaunched with the SAME CLI
    (warm_start + auto_resume both set) must resume its own 'last'
    checkpoint, not silently re-warm-start from the donor at step 0 and
    lose all fine-tune progress (round-2 ADVICE medium)."""
    import logging

    base = [
        "+exp=distortion", "model.name=tcn",
        "model.network.nblocks=3", "model.network.channel_width=8",
        "model.network.kernel_size=3", "model.network.dilation_growth=2",
    ] + _tiny_overrides()
    cfg = parse_cli(base + [f"logs_dir={tmp_path / 'a'}",
                            "trainer.max_steps=2", "trainer.max_epochs=1"])
    cfg["render_root"] = str(tmp_path / "data")
    fit(cfg)
    best = next((tmp_path / "a" / "ckpts").rglob("best"))

    ft = base + [f"logs_dir={tmp_path / 'b'}",
                 f"warm_start={best.resolve()}",
                 "trainer.auto_resume=true", "render_files=false"]

    def run(extra):
        c = parse_cli(ft + extra)
        c["render_root"] = str(tmp_path / "data")
        records = []
        h = logging.Handler()
        h.emit = lambda r: records.append(r.getMessage())
        logging.getLogger("remfx_tpu.train.loop").addHandler(h)
        try:
            state, _ = fit(c)
        finally:
            logging.getLogger("remfx_tpu.train.loop").removeHandler(h)
        return state, records

    # first launch: nothing to resume in logs_dir b -> warm-start
    _, rec1 = run(["trainer.max_steps=1", "trainer.max_epochs=1"])
    assert any("warm-started" in m for m in rec1), rec1
    # relaunch after "preemption" with the same CLI: must resume own last
    state2, rec2 = run(["trainer.max_steps=2", "trainer.max_epochs=2"])
    assert any("auto-resumed" in m and "step 1" in m for m in rec2), rec2
    assert not any("warm-started" in m for m in rec2), rec2
    assert int(state2.step) == 2, int(state2.step)


def test_warm_start_across_optimizer_structures(tmp_path):
    """warm_start is template-free: a donor trained under
    accumulate_grad_batches>1 (optax.MultiSteps-wrapped opt_state) must
    warm-start a run with a plain optimizer — only params/batch_stats
    are lifted (round-2 ADVICE low)."""
    import logging

    base = [
        "+exp=distortion", "model.name=tcn",
        "model.network.nblocks=3", "model.network.channel_width=8",
        "model.network.kernel_size=3", "model.network.dilation_growth=2",
    ] + _tiny_overrides()
    cfg = parse_cli(base + [f"logs_dir={tmp_path / 'a'}",
                            "trainer.max_steps=2", "trainer.max_epochs=1",
                            "trainer.accumulate_grad_batches=2"])
    cfg["render_root"] = str(tmp_path / "data")
    fit(cfg)
    best = next((tmp_path / "a" / "ckpts").rglob("best"))

    cfg2 = parse_cli(base + [f"logs_dir={tmp_path / 'b'}",
                             f"warm_start={best.resolve()}",
                             "trainer.max_steps=1", "trainer.max_epochs=1",
                             "render_files=false"])
    cfg2["render_root"] = str(tmp_path / "data")
    records = []
    h = logging.Handler()
    h.emit = lambda r: records.append(r.getMessage())
    logging.getLogger("remfx_tpu.train.loop").addHandler(h)
    try:
        state2, metrics2 = fit(cfg2)
    finally:
        logging.getLogger("remfx_tpu.train.loop").removeHandler(h)
    assert any("warm-started" in m for m in records), records
    assert np.isfinite(metrics2["test_loss"])
    assert int(state2.step) == 1

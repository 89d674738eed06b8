"""Training tasks: effect removal (RemFX) and effect classification.

Parity targets (reference remfx/models.py):
  * ``RemFX`` (152-256): AdamW(lr 1e-4, betas (0.95, 0.999), eps 1e-6,
    wd 1e-3) + MultiStepLR x0.1 at 80%/95% of max_steps; loss from the
    wrapped network; metrics SI-SDR and MR-STFT for output-vs-target AND
    input-vs-target (the ``Input_*`` baseline columns).
  * ``FXClassifier`` (423-592): AdamW(3e-4, wd 1e-3); Cnn14 path =
    per-head BCE summed + per-effect binary accuracy + macro average;
    optional mixup (p=0.5, lambda ~ U(0.25, 0.75) per example, labels
    OR-ed, models.py:393-420).

TPU-first: each step is one jitted pure function with donated state,
ready to be pjit-sharded over a mesh (see parallel/).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from remfx_tpu.losses import multi_resolution_stft_loss, si_sdr
from remfx_tpu.utils.crop import causal_crop


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def multistep_adamw(
    lr: float,
    max_steps: int,
    beta1: float = 0.95,
    beta2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 1e-3,
    gradient_clip_val: float = 10.0,
    milestones=(0.8, 0.95),
    gamma: float = 0.1,
):
    """AdamW + MultiStepLR (reference remfx/models.py:185-206) + the
    trainer's global-norm clip (cfg/config.yaml:119)."""
    if max_steps is None or max_steps <= 0:  # -1 = unlimited: constant LR
        schedule = lr
    else:
        schedule = optax.piecewise_constant_schedule(
            lr, {int(m * max_steps): gamma for m in milestones}
        )
    return optax.chain(
        optax.clip_by_global_norm(gradient_clip_val),
        optax.adamw(schedule, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay),
    )


# ------------------------------------------------------------------ removal


class RemovalTask:
    """Functional RemFX trainer around a ModelWrapper."""

    def __init__(
        self,
        wrapper,
        lr: float = 1e-4,
        lr_beta1: float = 0.95,
        lr_beta2: float = 0.999,
        lr_eps: float = 1e-6,
        lr_weight_decay: float = 1e-3,
        max_steps: int = 50000,
        gradient_clip_val: float = 10.0,
        sample_rate: int = 48000,
        accumulate_grad_batches: int = 1,
        precision: str = "32",
    ):
        self.wrapper = wrapper
        self.sample_rate = sample_rate
        # "bf16-mixed": bf16 compute / fp32 master weights + updates.
        # Params are cast inside loss_fn, so value_and_grad differentiates
        # the fp32 leaves and the cast's VJP returns fp32 grads; losses
        # promote to fp32 where they touch the fp32 target.
        self.precision = str(precision)
        # Lightning semantics: max_steps and the LR milestones count
        # OPTIMIZER steps; the fit() loop consumes accumulate_grad_batches
        # micro-batches per counted step (see train/loop.py).
        self.accumulate_grad_batches = int(accumulate_grad_batches)
        self.tx = multistep_adamw(
            lr, max_steps, lr_beta1, lr_beta2, lr_eps, lr_weight_decay,
            gradient_clip_val,
        )
        if accumulate_grad_batches > 1:
            # trainer.accumulate_grad_batches parity (cfg/config.yaml:
            # 116): average grads over k micro-batches per optimizer step
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=int(accumulate_grad_batches)
            )

    def init_state(self, key, example_x) -> TrainState:
        variables = self.wrapper.init(key, example_x)
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        return TrainState.create(
            apply_fn=None, params=params, tx=self.tx, batch_stats=batch_stats
        )

    @property
    def _half(self):
        return self.precision in ("bf16", "bf16-mixed", "bf16-true")

    @staticmethod
    def _cast_half(tree):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            tree,
        )

    def _variables(self, state):
        v = {"params": state.params}
        if state.batch_stats is not None:
            v["batch_stats"] = state.batch_stats
        return v

    def _metrics(self, output, x, y, loss, prefix):
        target = y
        if output.shape[-1] < y.shape[-1]:
            target = causal_crop(y, output.shape[-1])
        return {
            f"{prefix}_loss": loss,
            f"{prefix}_SISDR": si_sdr(output, target),
            f"{prefix}_STFT": multi_resolution_stft_loss(output, target),
            "Input_SISDR": si_sdr(x, y),
            "Input_STFT": multi_resolution_stft_loss(x, y),
        }

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(self, state: TrainState, batch, key):
        x, y = batch

        def loss_fn(params):
            xx = x
            if self._half:
                params = self._cast_half(params)
                xx = x.astype(jnp.bfloat16)
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = (
                    self._cast_half(state.batch_stats)
                    if self._half else state.batch_stats
                )
            loss, output, updates = self.wrapper.forward(
                variables, (xx, y), train=True, rngs={"dropout": key}
            )
            return loss.astype(jnp.float32), (output, updates)

        (loss, (output, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if updates is not None and state.batch_stats is not None:
            new_stats = updates["batch_stats"]
            if self._half:  # keep fp32 master stats
                new_stats = jax.tree.map(
                    lambda a, ref: a.astype(ref.dtype),
                    new_stats, state.batch_stats,
                )
            state = state.replace(batch_stats=new_stats)
        output = output.astype(jnp.float32)
        return state, self._metrics(output, x, y, loss, "train")

    @partial(jax.jit, static_argnums=(0, 3))
    def eval_step(self, state: TrainState, batch, prefix: str = "valid"):
        x, y = batch
        variables = self._variables(state)
        xx = x
        if self._half:
            variables = self._cast_half(variables)
            xx = x.astype(jnp.bfloat16)
        loss, output, _ = self.wrapper.forward(variables, (xx, y))
        return self._metrics(output.astype(jnp.float32), x, y,
                             loss.astype(jnp.float32), prefix)


# --------------------------------------------------------------- classifier


def mixup(key, x, y):
    """Reference mixup (remfx/models.py:393-420): with p=0.5 per batch,
    lambda ~ U(0.25, 0.75) per example, labels OR-ed."""
    k1, k2, k3 = jax.random.split(key, 3)
    B = x.shape[0]
    lam = jax.random.uniform(k1, (B, 1, 1), minval=0.25, maxval=0.75)
    index = jax.random.permutation(k2, B)
    do = jax.random.uniform(k3, ()) > 0.5
    mixed_x = jnp.where(do, lam * x + (1 - lam) * x[index], x)
    mixed_y = jnp.where(do, jnp.logical_or(y, y[index]).astype(y.dtype), y)
    return mixed_x, mixed_y


def _bce(probs, targets, eps=1e-7):
    p = jnp.clip(probs, eps, 1 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))


class ClassifierTask:
    """FXClassifier trainer.

    ``loss_type="bce"`` = the Cnn14 path (summed per-head BCE on sigmoid
    probs + per-effect accuracy); ``loss_type="ce"`` = the non-Cnn14 path
    (reference quirk #9: CrossEntropyLoss against multi-hot targets with
    optional label smoothing, metrics = multilabel F1 per class + macro;
    remfx/models.py:457-488,550-574).
    """

    def __init__(
        self,
        network,
        lr: float = 3e-4,
        lr_weight_decay: float = 1e-3,
        use_mixup: bool = False,
        sample_rate: int = 48000,
        effects=("Reverb", "Chorus", "Delay", "Distortion", "Compressor"),
        loss_type: str = "bce",
        label_smoothing: float = 0.0,
        gradient_clip_val: float = 10.0,
    ):
        self.network = network
        self.use_mixup = use_mixup
        self.effects = effects
        self.loss_type = loss_type
        self.label_smoothing = label_smoothing
        # trainer.gradient_clip_val applies to the classifier too
        # (reference cfg/exp/5-5_full_cls.yaml:59)
        self.tx = optax.chain(
            optax.clip_by_global_norm(gradient_clip_val),
            optax.adamw(lr, weight_decay=lr_weight_decay),
        )

    def init_state(self, key, example_x) -> TrainState:
        # jit: op-by-op flax init is pathologically slow on one CPU core
        variables = jax.jit(self.network.init, static_argnums=2)(
            {"params": key, "dropout": key, "specaugment": key}, example_x, False
        )
        return TrainState.create(
            apply_fn=None,
            params=variables["params"],
            tx=self.tx,
            batch_stats=variables.get("batch_stats"),
        )

    def _apply(self, params, batch_stats, x, train, rngs, mutable=False):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if mutable:
            return self.network.apply(
                variables, x, train, rngs=rngs, mutable=["batch_stats"]
            )
        return self.network.apply(variables, x, train, rngs=rngs)

    def _loss_and_metrics(self, outputs, labels, prefix):
        from remfx_tpu.train.metrics import multilabel_f1

        metrics = {}
        if self.loss_type == "ce":
            # torch CE with soft (multi-hot) targets + label smoothing
            logits = outputs
            C = logits.shape[-1]
            t = labels * (1.0 - self.label_smoothing) + self.label_smoothing / C
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(jnp.sum(t * logp, axis=-1))
            probs = jax.nn.sigmoid(logits)
            f1 = multilabel_f1(probs, labels)
            for i, name in enumerate(self.effects):
                metrics[f"{prefix}_f1_{name}"] = f1[i]
            metrics[f"{prefix}_loss"] = loss
            metrics[f"{prefix}_avg_acc"] = multilabel_f1(probs, labels, average="macro")
            return loss, metrics
        probs = outputs
        loss = 0.0
        accs = []
        for i, name in enumerate(self.effects):
            loss = loss + _bce(probs[:, i], labels[:, i])
            acc = jnp.mean((probs[:, i] > 0.5) == (labels[:, i] > 0.5))
            metrics[f"{prefix}_{name}_acc"] = acc
            accs.append(acc)
        metrics[f"{prefix}_loss"] = loss
        metrics[f"{prefix}_avg_acc"] = jnp.mean(jnp.stack(accs))
        return loss, metrics

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(self, state: TrainState, batch, key):
        x, labels = batch
        k_mix, k_drop, k_spec = jax.random.split(key, 3)
        if self.use_mixup:
            x, labels = mixup(k_mix, x, labels)

        def loss_fn(params):
            (probs, updates) = self._apply(
                params,
                state.batch_stats,
                x,
                True,
                {"dropout": k_drop, "specaugment": k_spec},
                mutable=True,
            )
            loss, metrics = self._loss_and_metrics(probs, labels, "train")
            return loss, (metrics, updates)

        (loss, (metrics, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if state.batch_stats is not None:
            state = state.replace(batch_stats=updates["batch_stats"])
        return state, metrics

    @partial(jax.jit, static_argnums=(0, 3))
    def eval_step(self, state: TrainState, batch, prefix: str = "valid"):
        x, labels = batch
        probs = self._apply(state.params, state.batch_stats, x, False, None)
        _, metrics = self._loss_and_metrics(probs, labels, prefix)
        return metrics

"""Removal-model wrappers: loss + sample contract.

Parity target: the reference wrapper contract (remfx/models.py:259-390):
``forward((x, target)) -> (loss, output)`` with
``loss = MRSTFT(out, target) + 100 * L1(out, target)`` and causal-crop of
the target when the model output is shorter (reference quirk: the crop
drops the final sample). ``sample(x) -> y`` for chain inference.

Here models are flax Modules; wrappers are thin pure-function adapters
holding the module + loss so tasks and the chain can stay functional.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax

from remfx_tpu.losses import l1_loss, multi_resolution_stft_loss
from remfx_tpu.utils.crop import causal_crop


@dataclass
class ModelWrapper:
    """Wraps a flax module into the reference's (loss, output) contract."""

    module: Any
    name: str = "model"
    l1_weight: float = 100.0
    takes_train_flag: bool = False
    # identity-start training mode (see make_demucs identity_init): the
    # module's final layers are zero-init'd and the wrapper adds the
    # input back, so step 0 is an exact passthrough — the same
    # plateau-escape lever DCUNet/UMX get from their identity-init
    # masks. Weight-compatible imports keep this False.
    residual: bool = False

    def init(self, key, example_x):
        # jit: flax init otherwise dispatches op-by-op (90+ s for HDemucs
        # on one CPU core); compiled init is persistent-cacheable
        rngs = {"params": key, "dropout": key}
        if self.takes_train_flag:
            return jax.jit(self.module.init, static_argnums=2)(
                rngs, example_x, False
            )
        return jax.jit(self.module.init)(rngs, example_x)

    def apply(self, variables, x, train: bool = False, rngs=None):
        """-> (output, batch_stats_updates | None)."""
        kwargs = {}
        args = (x, train) if self.takes_train_flag else (x,)
        if train and "batch_stats" in variables:
            out, updates = self.module.apply(
                variables, *args, rngs=rngs, mutable=["batch_stats"], **kwargs
            )
            if self.residual:
                out = out + x[..., : out.shape[-1]]
            return out, updates
        out = self.module.apply(variables, *args, rngs=rngs, **kwargs)
        if self.residual:
            out = out + x[..., : out.shape[-1]]
        return out, None

    def forward(self, variables, batch, train: bool = False, rngs=None):
        """-> (loss, output, updates)."""
        x, target = batch
        output, updates = self.apply(variables, x, train=train, rngs=rngs)
        if output.shape[-1] < target.shape[-1]:
            target = causal_crop(target, output.shape[-1])
        if train and output.dtype != target.dtype:
            # bf16-mixed policy: keep the LOSS in the compute dtype.
            # A fp32 target would promote its whole STFT branch to
            # fp32-HIGHEST GEMMs (~half the loss cost on the MXU).
            # Magnitude/log/norm reductions still accumulate in fp32
            # inside the loss; only the DFT operands drop precision.
            # Eval metrics (tasks._metrics) are computed separately in
            # fp32 and are unaffected.
            target = target.astype(output.dtype)
        loss = multi_resolution_stft_loss(output, target) + self.l1_weight * l1_loss(
            output, target
        )
        return loss, output, updates

    def sample(self, variables, x):
        """Inference: (B, C, T) -> (B, C, T') denoised/removed audio."""
        return self.apply(variables, x, train=False)[0]

"""Pipeline-parallel chain inference: one removal stage per device.

The detect+remove chain is a fixed sequence of heterogeneous models
(classifier + up to five removal backbones, reference
remfx/models.py:22-149 / cfg/exp/remfx_detect.yaml:80-85) — exactly a
pipeline. Here each stage's parameters live permanently on their own
device; window batches stream through, and activations hop device-to-
device over ICI. JAX's async dispatch overlaps stage k on window i with
stage k-1 on window i+1 without any explicit double-buffering: the host
submits every (stage, window) computation ahead of execution and only
blocks on the final gather, so with W windows and S stages the wall
clock is ~(W + S - 1) stage-times instead of W * S on one chip.

This complements the other parallel modes: dp (batch sharding), tp
(channel sharding), sp (time sharding, parallel/mesh.py shard_time).
Use pp when a single model's weights + activations fill a chip (e.g.
batch-64 Large-DCUNet-20 exceeds HBM, BASELINE.md) or to serve the
whole chain at per-stage batch sizes that individually saturate the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from remfx_tpu import ALL_EFFECTS, EFFECT_CLASS_NAMES
from remfx_tpu.chain.inference import masked_stage, threshold_detect


class PipelineChain:
    """Stage-per-device executor over a ChainInference's models.

    ``chain``: a ChainInference (models + optional classifier + order).
    ``devices``: list of jax devices; stages are assigned round-robin
    (classifier first when present). Defaults to all local devices.
    """

    def __init__(self, chain, devices=None):
        self.chain = chain
        devices = list(devices if devices is not None else jax.devices())
        self.order = tuple(n for n in chain.effect_order if n in chain.models)
        stages = (["classifier"] if chain.classifier is not None else [])
        stages += list(self.order)
        self.stage_device = {
            name: devices[i % len(devices)] for i, name in enumerate(stages)
        }
        # park each stage's parameters on its device once
        self._vars = {}
        for name in self.order:
            _, variables = chain.models[name]
            self._vars[name] = jax.device_put(
                variables, self.stage_device[name])
        if chain.classifier is not None:
            _, cls_vars = chain.classifier
            self._vars["classifier"] = jax.device_put(
                cls_vars, self.stage_device["classifier"])
        self._jits = {}

    def _stage(self, name):
        # stage semantics come from chain/inference.py's shared builders
        # so every dispatch mode (single/staged/regroup/pp) stays in sync
        if name in self._jits:
            return self._jits[name]
        if name == "classifier":
            net, _ = self.chain.classifier
            run = threshold_detect(net, self.chain.threshold)
        else:
            wrapper, _ = self.chain.models[name]
            idx = ALL_EFFECTS.index(EFFECT_CLASS_NAMES[name])
            run = masked_stage(wrapper, idx)

        fn = jax.jit(run)
        self._jits[name] = fn
        return fn

    def __call__(self, windows, labels=None):
        """windows: iterable of (B, C, T) batches. labels: (B, 5) float
        per window, or None to detect with the chain's classifier.
        -> list of (y, labels) in input order; nothing blocks until the
        caller reads a result, so stages overlap across windows."""
        outs = []
        for x in windows:
            lab = labels
            if lab is None:
                if self.chain.classifier is None:
                    lab = jnp.ones((x.shape[0], 5), jnp.float32)
                else:
                    dev = self.stage_device["classifier"]
                    lab = self._stage("classifier")(
                        self._vars["classifier"], jax.device_put(x, dev))
            if self.chain.use_all_effect_models:
                lab = jnp.ones_like(lab)
            y = x
            for name in self.order:
                dev = self.stage_device[name]
                y = self._stage(name)(
                    self._vars[name],
                    jax.device_put(y, dev),
                    jax.device_put(lab, dev),
                )
            outs.append((y, lab))
        return outs

"""Device mesh + sharding helpers (data parallel + tensor parallel).

The reference has no distributed runtime (SURVEY.md §2.10: single GPU).
Here parallelism is first-class: batch data-parallelism over a "dp" mesh
axis and optional tensor sharding of wide channel dims over "tp". We
annotate shardings with ``NamedSharding`` and let GSPMD insert the
collectives (psum for gradients, all-gathers around tp-sharded convs) —
no hand-written communication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis over dp; replicate over tp."""
    s = NamedSharding(mesh, P("dp"))
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def shard_tcn_params(params, mesh: Mesh):
    """Tensor-shard TCN channel dims over "tp": conv kernels (k, in, out)
    sharded on the output-channel dim for hidden blocks; biases likewise.
    GSPMD propagates and inserts the needed collectives."""

    def spec_for(path, x):
        keys = [getattr(p, "key", str(p)) for p in path]
        name = "/".join(keys)
        if "output" in name:  # final 1x1 conv stays replicated
            return P()
        if x.ndim == 3:  # conv kernel (k, in, out)
            return P(None, None, "tp")
        if x.ndim == 1 and x.shape[0] > 1:  # bias / prelu slope (C,)
            return P("tp")
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, NamedSharding(mesh, spec_for(path, x))),
        params,
    )


def shard_params_channels(params, mesh: Mesh, min_channels: int = 16):
    """Generic tensor-parallel placement: shard every kernel's output-
    channel (last) axis over "tp" when it divides evenly and is wide
    enough to be worth it; 1-D per-channel vectors (bias, norm scale,
    layer-scale) follow. Everything else is replicated. GSPMD then
    inserts the all-gathers/reduce-scatters — the placement is a layout
    hint, never a semantics change, so it is safe for any architecture
    (HDemucs GLU pairs, LSTM gate stacks, complex re/im kernel pairs)."""
    tp = mesh.shape["tp"]

    def spec_for(x):
        if tp == 1 or not hasattr(x, "ndim"):
            return P()
        if x.ndim >= 2 and x.shape[-1] % tp == 0 and x.shape[-1] >= min_channels:
            return P(*([None] * (x.ndim - 1) + ["tp"]))
        if x.ndim == 1 and x.shape[0] % tp == 0 and x.shape[0] >= min_channels:
            return P("tp")
        return P()

    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec_for(x))), params
    )


def shard_time(x, mesh: Mesh, axis: str = "dp"):
    """Sequence parallelism for long-file inference: shard the trailing
    (time) axis of ``(B, C, T)`` audio over a mesh axis and let GSPMD
    insert the halo exchanges around convolutions / STFT framing. With
    batch 1 (a single long file) the "dp" axis is otherwise idle, so one
    pod processes the file with each chip holding T/n samples — an
    alternative to host-side windowing (chain/stream.py) that keeps the
    crossfade-free exact math of whole-file processing.

    Output of a jitted model applied to a time-sharded input matches the
    unsharded result to float rounding (tests/test_parallel.py).
    """
    x = jnp.asarray(x)
    spec = P(*([None] * (x.ndim - 1) + [axis]))
    return jax.device_put(x, NamedSharding(mesh, spec))

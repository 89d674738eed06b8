"""Pallas TPU kernel: ballistics envelope follower (compressor/limiter).

The JUCE envelope recurrence

    env[t] = xa[t] + cte * (env[t-1] - xa[t]),
    cte    = cte_attack if xa[t] > env[t-1] else cte_release

is data-dependent (branch on the carry), so no FFT/associative-scan
shortcut exists — it is the one truly sequential loop in the effect
suite. This kernel runs it time-sequentially but **batch-parallel on the
VPU lanes**: layout (T, B) with B on the 128-wide lane axis, grid over
time chunks with the carry in VMEM scratch (scratch persists across the
sequential TPU grid), one (1, B) vector op per sample.

Throughput: one loop iteration processes 128+ signals, so 262144 steps
amortize to ~milliseconds for a full batch — versus a ``lax.scan`` whose
per-step dispatch dominates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TIME_CHUNK = 2048
_LANES = 128


def _env_kernel(cat_ref, crl_ref, x_ref, o_ref, env_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        env_ref[...] = jnp.zeros_like(env_ref)

    cat = cat_ref[...]  # (1, B)
    crl = crl_ref[...]

    def body(t, env):
        xa = x_ref[t, :][None, :]
        cte = jnp.where(xa > env, cat, crl)
        env = xa + cte * (env - xa)
        o_ref[t, :] = env[0]
        return env

    env_ref[...] = jax.lax.fori_loop(0, x_ref.shape[0], body, env_ref[...])


@partial(jax.jit, static_argnames=("interpret",))
def _envelope_tb(x_tb, cte_at, cte_rl, interpret: bool):
    T, B = x_tb.shape
    n_chunks = T // _TIME_CHUNK
    return pl.pallas_call(
        _env_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TIME_CHUNK, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TIME_CHUNK, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B), x_tb.dtype),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.float32)],
        interpret=interpret,
    )(cte_at[None, :], cte_rl[None, :], x_tb)


def envelope_pallas(x_abs, cte_at, cte_rl, interpret: bool | None = None):
    """Ballistics envelope over the last axis. x_abs: (B, T); coefficients
    scalars or (B,). Pads B to the lane width and T to the chunk size."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T = x_abs.shape
    cte_at = jnp.broadcast_to(jnp.asarray(cte_at, jnp.float32), (B,))
    cte_rl = jnp.broadcast_to(jnp.asarray(cte_rl, jnp.float32), (B,))
    Bp = -(-B // _LANES) * _LANES
    Tp = -(-T // _TIME_CHUNK) * _TIME_CHUNK
    x_tb = jnp.pad(x_abs, [(0, Bp - B), (0, Tp - T)]).T  # (Tp, Bp)
    cat = jnp.pad(cte_at, (0, Bp - B))
    crl = jnp.pad(cte_rl, (0, Bp - B))
    env = _envelope_tb(x_tb, cat, crl, interpret)
    return env.T[:B, :T]

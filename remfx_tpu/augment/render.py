"""On-device effect-chain rendering with label semantics.

TPU-native equivalent of the reference's ``EffectDataset.process_effects``
(remfx/datasets.py:521-585) and ``parallel_process_effects``
(datasets.py:109-202), replacing the Pool-of-32 CPU fan-out with
device-side batched rendering:

  1. choose a random subset/order of ``effects_to_keep`` — count drawn as
     ``round((r1-r2)*U + r2)`` (reference quirk: endpoint half-weighting,
     datasets.py:529-531) — apply each with LUFS normalize (-20) in
     between -> "dry";
  2. same for ``effects_to_remove`` applied on top -> "wet";
  3. multi-hot labels indexed by the canonical ALL_EFFECTS order
     [reverb, chorus, delay, distortion, compressor];
  4. final LUFS normalize of both; if MRSTFT(wet, dry) < 1e-3 re-draw the
     effects (bounded retries; reference re-applies kept effects onto the
     already-effected dry — quirk #4 — which we replicate).

Two dispatch modes:

  * ``"switch"`` — every chain slot is a ``lax.switch`` and the whole
    render is ONE jitted graph (cheap at runtime, but the target
    backend's compiler takes unbounded time on the full 5-effect graph).
  * ``"dense"`` (default) — host-orchestrated: each effect's batched
    render is its own small jitted function; per slot, the examples
    assigned to each effect are gathered into a pow2-bucketed sub-batch,
    rendered, and scattered back (utils/regroup.py) — compute scales
    with assigned work, compile units stay small and shared across
    slots/stages.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from remfx_tpu import ALL_EFFECTS
from remfx_tpu.fx import make_effect
from remfx_tpu.losses import multi_resolution_stft_loss
from remfx_tpu.ops.loudness import loudness_normalize
from remfx_tpu.utils.regroup import bucketed_indices

STFT_THRESH = 1e-3  # reference remfx/datasets.py:19


class EffectChainRenderer:
    """Static-config chain renderer.

    ``render(key, x)``: single example (switch mode only).
    ``render_batch(key, x)``: batch; dispatch per ``self.dispatch``.
    ``effect_overrides`` maps effect name -> range-override dict (the
    cfg/effects/all.yaml surface).
    """

    def __init__(
        self,
        sample_rate: int,
        effects_to_keep: tuple[str, ...] = (),
        effects_to_remove: tuple[str, ...] = (),
        num_kept_effects: tuple[int, int] = (0, 0),
        num_removed_effects: tuple[int, int] = (0, 0),
        shuffle_kept_effects: bool = True,
        shuffle_removed_effects: bool = False,
        target_lufs_db: float = -20.0,
        effect_overrides: dict | None = None,
        max_redraws: int = 4,
        stft_check: bool = True,
        dispatch: str = "dense",
    ):
        overrides = effect_overrides or {}
        self.sample_rate = int(sample_rate)
        self.effects_to_keep = tuple(effects_to_keep)
        self.effects_to_remove = tuple(effects_to_remove)
        self.num_kept_effects = tuple(num_kept_effects)
        self.num_removed_effects = tuple(num_removed_effects)
        self.shuffle_kept_effects = shuffle_kept_effects
        self.shuffle_removed_effects = shuffle_removed_effects
        self.target_lufs_db = target_lufs_db
        self.max_redraws = max_redraws
        self.stft_check = stft_check
        self.dispatch = dispatch
        for name in self.effects_to_keep + self.effects_to_remove:
            if name not in ALL_EFFECTS:
                raise ValueError(
                    f"Effect {name!r} not found in ALL_EFFECTS {ALL_EFFECTS}"
                )
        self._fx = {
            name: make_effect(name, sample_rate, **overrides.get(name, {}))
            for name in set(self.effects_to_keep + self.effects_to_remove)
        }
        # dense mode: one jitted batched (sample+render+normalize) per effect;
        # effects with a native batch renderer (Pallas compressor) use it
        self._batched_fx = {}
        for name, eff in self._fx.items():
            if eff.batch_render_fn is not None:

                def batched(keys, xb, _eff=eff):
                    params = jax.vmap(_eff.sample_params)(keys)
                    out = _eff.batch_render_fn(
                        xb, params, int(self.sample_rate)
                    ).astype(xb.dtype)
                    return jax.vmap(self._normalize)(out).astype(xb.dtype)

            else:

                def batched(keys, xb, _eff=eff):
                    def one(k, v):
                        out = _eff(k, v).astype(v.dtype)
                        return self._normalize(out).astype(v.dtype)

                    return jax.vmap(one)(keys, xb)

            self._batched_fx[name] = jax.jit(batched)
        self._mrstft_each = jax.jit(
            lambda a, b: jax.vmap(
                lambda u, v: multi_resolution_stft_loss(u[None], v[None])
            )(a, b)
        )
        self._normalize_batch = jax.jit(jax.vmap(self._normalize))

    # ------------------------------------------------------------------

    def _normalize(self, x):
        return loudness_normalize(x, self.sample_rate, self.target_lufs_db)

    # ----------------------------------------------------- switch dispatch

    def _apply_stage(self, key, x, labels, names, shuffle, num_range):
        """Apply one kept/removed stage (traced); returns (x, labels)."""
        n_cand = len(names)
        if n_cand == 0:
            return x, labels
        k_perm, k_count, k_fx = jax.random.split(key, 3)
        perm = (
            jax.random.permutation(k_perm, n_cand)
            if shuffle
            else jnp.arange(n_cand)
        )
        r1, r2 = num_range
        u = jax.random.uniform(k_count, ())
        count = jnp.round((r1 - r2) * u + r2).astype(jnp.int32)

        global_idx = jnp.asarray([ALL_EFFECTS.index(n) for n in names])
        slot_keys = jax.random.split(k_fx, n_cand)

        def identity_branch(op):
            kk, v = op
            return v

        branches = [identity_branch]
        for name in names:
            eff = self._fx[name]

            def branch(op, eff=eff):
                kk, v = op
                out = eff(kk, v).astype(v.dtype)
                return self._normalize(out).astype(v.dtype)

            branches.append(branch)

        for s in range(n_cand):
            local = perm[s]
            active = s < count
            which = jnp.where(active, local + 1, 0)
            x = jax.lax.switch(which, branches, (slot_keys[s], x))
            labels = labels.at[global_idx[local]].max(jnp.where(active, 1.0, 0.0))
        return x, labels

    def render(self, key, x):
        """x: (C, T) clean chunk -> (dry, wet, dry_labels, wet_labels).

        Returns post-normalize dry/wet exactly like the reference
        (normalized_dry/normalized_wet, datasets.py:577-578). Single
        jitted graph (switch mode).
        """

        def attempt(carry):
            key, dry, _, _, _, tries = carry
            key, k_keep, k_rem = jax.random.split(key, 3)
            dry_labels = jnp.zeros((len(ALL_EFFECTS),), jnp.float32)
            wet_labels = jnp.zeros((len(ALL_EFFECTS),), jnp.float32)
            dry, dry_labels = self._apply_stage(
                k_keep, dry, dry_labels, self.effects_to_keep,
                self.shuffle_kept_effects, self.num_kept_effects,
            )
            wet, wet_labels = self._apply_stage(
                k_rem, dry, wet_labels, self.effects_to_remove,
                self.shuffle_removed_effects, self.num_removed_effects,
            )
            norm_dry = self._normalize(dry)
            norm_wet = self._normalize(wet)
            return key, dry, (norm_dry, norm_wet), dry_labels, wet_labels, tries + 1

        def needs_redraw(carry):
            _, _, (norm_dry, norm_wet), _, wet_labels, tries = carry
            n_removed = jnp.sum(wet_labels)
            dist = multi_resolution_stft_loss(norm_wet[None], norm_dry[None])
            # tries counts ATTEMPTS (initial render = 1); allow up to
            # max_redraws re-draws after it, matching the dense path's
            # `for tries in range(max_redraws)` loop
            return (
                (tries <= self.max_redraws) & (n_removed > 0) & (dist < STFT_THRESH)
            )

        zeros = jnp.zeros((len(ALL_EFFECTS),), jnp.float32)
        carry = attempt((key, x, (x, x), zeros, zeros, jnp.int32(0)))
        if self.stft_check and self.effects_to_remove:
            carry = jax.lax.while_loop(needs_redraw, lambda c: attempt(c), carry)
        _, _, (norm_dry, norm_wet), dry_labels, wet_labels, _ = carry
        return norm_dry, norm_wet, dry_labels, wet_labels

    # ------------------------------------------------------ dense dispatch

    def _draw_stage_plan(self, key, batch, names, shuffle, num_range):
        """Host-side draw of per-example slot plans.

        Returns (slot_effect (B, n_cand) int local index or -1, labels
        (B, 5)). Uses jax.random so the pipeline stays key-deterministic.
        """
        n_cand = len(names)
        k_perm, k_count = jax.random.split(key)
        if shuffle:
            # one vmapped dispatch + one host sync for all B permutations
            # (a per-example Python loop costs B device round-trips)
            perms = np.asarray(
                jax.vmap(lambda k: jax.random.permutation(k, n_cand))(
                    jax.random.split(k_perm, batch)
                )
            )
        else:
            perms = np.tile(np.arange(n_cand), (batch, 1))
        r1, r2 = num_range
        u = np.asarray(jax.random.uniform(k_count, (batch,)))
        counts = np.round((r1 - r2) * u + r2).astype(np.int32)
        slot_effect = np.where(
            np.arange(n_cand)[None, :] < counts[:, None], perms, -1
        )
        labels = np.zeros((batch, len(ALL_EFFECTS)), np.float32)
        gidx = np.asarray([ALL_EFFECTS.index(n) for n in names])
        for s in range(n_cand):
            sel = slot_effect[:, s] >= 0
            labels[np.where(sel)[0], gidx[slot_effect[sel, s]]] = 1.0
        return slot_effect, labels

    def _run_stage_dense(self, key, x, names, shuffle, num_range):
        """x: (B, C, T) -> (x_out, labels (B,5)). Host-orchestrated."""
        B = x.shape[0]
        if not names:
            return x, np.zeros((B, len(ALL_EFFECTS)), np.float32)
        k_plan, k_fx = jax.random.split(key)
        slot_effect, labels = self._draw_stage_plan(
            k_plan, B, names, shuffle, num_range
        )
        for s in range(len(names)):
            k_slot = jax.random.fold_in(k_fx, s)
            ex_keys = jax.random.split(k_slot, B)
            col = slot_effect[:, s]
            for li, name in enumerate(names):
                sel = np.nonzero(col == li)[0]
                if sel.size == 0:
                    continue
                # sub-batch regrouping: render only this slot's members
                # (pow2-padded), not the full batch (round-1 dense mode
                # burned ~n_candidates x the necessary compute)
                gi = jnp.asarray(bucketed_indices(sel, max_size=B))
                y = self._batched_fx[name](
                    jnp.take(ex_keys, gi, axis=0), jnp.take(x, gi, axis=0)
                )
                x = x.at[gi].set(y)
        return x, labels

    def render_batch(self, key, x):
        """x: (B, C, T) -> batched (dry, wet, dry_labels, wet_labels)."""
        if self.dispatch == "switch":
            keys = jax.random.split(key, x.shape[0])
            return jax.vmap(self.render)(keys, x)

        k_keep, k_rem, k_redraw = jax.random.split(key, 3)
        dry, dry_labels = self._run_stage_dense(
            k_keep, x, self.effects_to_keep,
            self.shuffle_kept_effects, self.num_kept_effects,
        )
        wet, wet_labels = self._run_stage_dense(
            k_rem, dry, self.effects_to_remove,
            self.shuffle_removed_effects, self.num_removed_effects,
        )
        norm_dry = self._normalize_batch(dry)
        norm_wet = self._normalize_batch(wet)

        if self.stft_check and self.effects_to_remove:
            B = norm_wet.shape[0]
            for tries in range(self.max_redraws):
                dist = np.asarray(self._mrstft_each(norm_wet, norm_dry))
                n_removed = wet_labels.sum(axis=1)
                bad = (dist < STFT_THRESH) & (n_removed > 0)
                if not bad.any():
                    break
                # reference quirk #4: re-draw from the already-effected
                # dry. Only the FAILING examples re-render (pow2-bucketed
                # sub-batch + scatter, like the slot dispatch above) —
                # redraws are rare, so the full-batch version paid ~B/n_bad
                # times the necessary effect rendering per retry.
                sel = np.nonzero(bad)[0]
                gi = jnp.asarray(bucketed_indices(sel, max_size=B))
                kk = jax.random.fold_in(k_redraw, tries)
                k_keep2, k_rem2 = jax.random.split(kk)
                dry2, dl2 = self._run_stage_dense(
                    k_keep2, jnp.take(dry, gi, axis=0), self.effects_to_keep,
                    self.shuffle_kept_effects, self.num_kept_effects,
                )
                wet2, wl2 = self._run_stage_dense(
                    k_rem2, dry2, self.effects_to_remove,
                    self.shuffle_removed_effects, self.num_removed_effects,
                )
                # pad duplicates draw per-POSITION keys inside
                # _run_stage_dense (different values), so scatter only
                # the real selection rows — n is a host int, these run
                # eagerly, and the pow2 bucket already bounds the jitted
                # signatures upstream
                n = sel.size
                sel_j = jnp.asarray(sel)
                dry = jnp.asarray(dry).at[sel_j].set(dry2[:n])
                norm_dry = jnp.asarray(norm_dry).at[sel_j].set(
                    self._normalize_batch(dry2)[:n])
                norm_wet = jnp.asarray(norm_wet).at[sel_j].set(
                    self._normalize_batch(wet2)[:n])
                dry_labels = np.asarray(dry_labels).copy()
                wet_labels = np.asarray(wet_labels).copy()
                dry_labels[sel] = np.asarray(dl2)[:n]
                wet_labels[sel] = np.asarray(wl2)[:n]

        return norm_dry, norm_wet, jnp.asarray(dry_labels), jnp.asarray(wet_labels)

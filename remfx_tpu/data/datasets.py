"""Datasets + datamodule: offline-rendered, dynamic (on-the-fly), and
paired-inference, with the reference's directory contract.

TPU-native redesign of remfx/datasets.py: rendering is batched on device
through ``EffectChainRenderer`` (augment/render.py) instead of a
``multiprocessing.Pool(32)`` of C++ pedalboard calls — one jax.random
key tree replaces the reference's per-worker RNG pathology
(datasets.py:124). Disk layout and tuple order are contract-identical:

    {render_root}/processed/{effects_string}/{mode}/{idx}/
        input.wav  target.wav  dry_effects.pt  wet_effects.pt

and ``__getitem__`` -> (wet/input, dry/target, dry_effects, wet_effects)
(reference datasets.py:370-380,461-468).
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

import jax
import numpy as np

from remfx_tpu import ALL_EFFECTS
from remfx_tpu.augment.render import EffectChainRenderer
from remfx_tpu.data.sources import ChunkSource
from remfx_tpu.data.wav import read_wav, write_wav
from remfx_tpu.utils import heartbeat
from remfx_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _effects_string(keep, remove, num_kept, num_removed) -> str:
    """Reference's proc-dir key (remfx/datasets.py:370-380)."""
    return "_".join(
        list(keep)
        + ["_"]
        + list(remove)
        + ["_"]
        + [str(x) for x in num_kept]
        + ["_"]
        + [str(x) for x in num_removed]
    )


def _save_labels(path: Path, labels: np.ndarray):
    """Write a 5-dim multi-hot label tensor as a torch .pt so the
    rendered tree is readable by the reference's torch.load
    (datasets.py:449-450). Falls back to numpy if torch is absent."""
    try:
        import torch

        torch.save(torch.from_numpy(np.array(labels, np.float32, copy=True)), path)
    except ImportError:  # pragma: no cover - torch is baked into the image
        np.save(str(path) + ".npy", np.asarray(labels, np.float32))


def _load_labels(path: Path) -> np.ndarray:
    try:
        import torch

        return np.asarray(torch.load(path, weights_only=True), np.float32)
    except ImportError:  # pragma: no cover
        return np.load(str(path) + ".npy").astype(np.float32)


def _validate_effect_input(keep, remove, num_kept, num_removed,
                           shuffle_kept, shuffle_removed):
    """Name/range validation + Effect Summary (reference
    datasets.py:470-519)."""
    for effect in list(keep) + list(remove):
        if effect not in ALL_EFFECTS:
            raise ValueError(
                f"Effect {effect} not found in ALL_EFFECTS. "
                f"Please choose from {ALL_EFFECTS}"
            )
    for label, rng_ in (("num_kept_effects", num_kept),
                        ("num_removed_effects", num_removed)):
        if rng_[0] > rng_[1]:
            raise ValueError(f"{label} must be a tuple of (min, max). Got {rng_}")

    def span(rng_):
        return str(rng_[0]) if rng_[0] == rng_[1] else f"Between {rng_[0]}-{rng_[1]}"

    kept_str = "randomly" if shuffle_kept else "in order"
    rem_str = "randomly" if shuffle_removed else "in order"
    log.info(
        "Effect Summary:\n"
        "Apply kept effects: %s (%s, chosen %s) -> Dry\n"
        "Apply remove effects: %s (%s, chosen %s) -> Wet",
        list(keep), span(num_kept), kept_str,
        list(remove), span(num_removed), rem_str,
    )


_RENDERER_CACHE: dict = {}


def _shared_renderer(**kw) -> EffectChainRenderer:
    """One EffectChainRenderer per distinct config per process.

    The renderer is stateless between calls but owns per-instance
    ``jax.jit`` wrappers; a fresh instance per dataset (train/val/test
    all build one) recompiled every (effect, bucket-size) signature —
    ~10-100 s each on the remote compiler, which dominated round-3's
    dataset rendering (BASELINE.md: 4.5 s/chunk vs the 0.09 s/chunk
    steady state). Sharing turns val/test rendering into pure compute."""

    def freeze(v):
        if isinstance(v, dict):
            return tuple(sorted((k, freeze(x)) for k, x in v.items()))
        if isinstance(v, (list, tuple)):
            return tuple(freeze(x) for x in v)
        return v

    key = freeze(kw)
    if key not in _RENDERER_CACHE:
        _RENDERER_CACHE[key] = EffectChainRenderer(**kw)
    return _RENDERER_CACHE[key]


class _RenderedBase:
    """Shared config/renderer setup for offline + dynamic datasets."""

    def __init__(
        self,
        root=None,
        sample_rate: int = 48000,
        chunk_size: int = 262144,
        total_chunks: int = 1000,
        effects_to_keep=(),
        effects_to_remove=(),
        num_kept_effects=(1, 5),
        num_removed_effects=(1, 5),
        shuffle_kept_effects: bool = True,
        shuffle_removed_effects: bool = False,
        effect_overrides: dict | None = None,
        mode: str = "train",
        seed: int = 12345,
        synthetic: bool = False,
        synthetic_rich: bool = False,
        synthetic_real_files=(),
    ):
        self.sample_rate = int(sample_rate)
        self.chunk_size = int(chunk_size)
        self.total_chunks = int(total_chunks)
        self.mode = mode
        self.seed = int(seed)
        self.effects_to_keep = tuple(effects_to_keep or ())
        self.effects_to_remove = tuple(effects_to_remove or ())
        self.num_kept_effects = tuple(num_kept_effects)
        self.num_removed_effects = tuple(num_removed_effects)
        _validate_effect_input(
            self.effects_to_keep, self.effects_to_remove,
            self.num_kept_effects, self.num_removed_effects,
            shuffle_kept_effects, shuffle_removed_effects,
        )
        self.effects_string = _effects_string(
            self.effects_to_keep, self.effects_to_remove,
            self.num_kept_effects, self.num_removed_effects,
        )
        overrides = effect_overrides or {}
        self.renderer = _shared_renderer(
            sample_rate=self.sample_rate,
            effects_to_keep=self.effects_to_keep,
            effects_to_remove=self.effects_to_remove,
            num_kept_effects=self.num_kept_effects,
            num_removed_effects=self.num_removed_effects,
            shuffle_kept_effects=shuffle_kept_effects,
            shuffle_removed_effects=shuffle_removed_effects,
            effect_overrides={
                k: v for k, v in overrides.items()
                if k in self.effects_to_keep + self.effects_to_remove
            },
        )
        self.source = ChunkSource(
            root, mode, self.chunk_size, self.sample_rate,
            synthetic=synthetic, rich=synthetic_rich,
            real_files=tuple(synthetic_real_files or ()),
        )
        # distinct stream per (seed, mode) so train/val/test differ
        self._mode_salt = {"train": 0, "val": 1, "test": 2}.get(mode, 3)

    def _chunk_batch(self, rng: np.random.Generator, n: int) -> np.ndarray:
        return np.stack([self.source.sample(rng) for _ in range(n)])

    def _render_batch(self, key, chunks: np.ndarray, device: bool = False):
        import jax.numpy as jnp

        dry, wet, dry_labels, wet_labels = self.renderer.render_batch(
            key, jnp.asarray(chunks)
        )
        heartbeat.beat()  # liveness for scripts/supervise.py
        if device:
            # device-resident batch: the render already lives in HBM and
            # the consumer (train_step/eval_step) is jitted — converting
            # to numpy here would read the batch back through the device
            # tunnel at its measured 0.5 MB/s (66 s for a 32 MB batch!)
            # and re-upload it one step later. No reference analogue:
            # torch renders on CPU workers, so host-side batches are free
            # there (remfx/datasets.py:205-330).
            return (
                wet.astype(jnp.float32),
                dry.astype(jnp.float32),
                dry_labels.astype(jnp.float32),
                wet_labels.astype(jnp.float32),
            )
        return (
            np.asarray(wet, np.float32),
            np.asarray(dry, np.float32),
            np.asarray(dry_labels, np.float32),
            np.asarray(wet_labels, np.float32),
        )

    def __len__(self):
        return self.total_chunks


class EffectDataset(_RenderedBase):
    """Offline-rendered dataset (reference EffectDataset,
    datasets.py:333-585): renders ``total_chunks`` examples to the
    contract directory tree at construction, then serves from disk."""

    def __init__(self, *, render_files: bool = True, render_root=None,
                 render_batch_size: int = 8, **kw):
        super().__init__(**kw)
        if render_root is None:
            raise ValueError("EffectDataset requires render_root")
        self.proc_root = (
            Path(render_root) / "processed" / self.effects_string / self.mode
        )
        self.render_batch_size = int(render_batch_size)

        resume_from = 0
        if self.proc_root.exists() and any(self.proc_root.iterdir()):
            # a chunk dir is complete iff its last-written file exists;
            # completeness is counted contiguously from 0 because the
            # render loop writes index-ordered (a killed run leaves a
            # prefix + at most one ragged batch)
            n_complete = 0
            while (self.proc_root / str(n_complete) / "wet_effects.pt").exists():
                n_complete += 1
            if render_files and n_complete < self.total_chunks:
                # partial render (e.g. the process was killed by the
                # supervisor mid-render): resume at the batch boundary
                # at or below the first incomplete chunk — rendering is
                # deterministic in (seed, mode, batch index), so the
                # completed prefix is bit-identical to a fresh run's
                resume_from = (
                    n_complete // int(render_batch_size)
                ) * int(render_batch_size)
                log.info(
                    "Resuming partial render at %s: %d/%d chunks complete,"
                    " restarting from chunk %d",
                    self.proc_root, n_complete, self.total_chunks,
                    resume_from,
                )
            elif render_files and os.environ.get("REMFX_RENDER_REUSE") == "1":
                # supervised relaunch (scripts/supervise.py): a kill
                # after rendering completed must NOT trip the re-render
                # guard below — reuse the complete render and move on
                log.info("Reusing complete render at %s (%d chunks,"
                         " REMFX_RENDER_REUSE=1)", self.proc_root, n_complete)
                render_files = False
            elif render_files:
                log.info("Found processed files at %s", self.proc_root)
                # reference's interactive y/n guard (datasets.py:385-395);
                # non-interactive runs must opt in via env to re-render
                if os.environ.get("REMFX_FORCE_RERENDER") == "1":
                    answer = "y"
                elif sys.stdin.isatty():
                    answer = input(
                        "WARNING: By default, will re-render files.\n"
                        "Set render_files=False to skip re-rendering.\n"
                        "Are you sure you want to re-render? (y/n): "
                    )
                else:
                    raise SystemExit(
                        f"processed files exist at {self.proc_root}; set "
                        "render_files=False to reuse them or "
                        "REMFX_FORCE_RERENDER=1 to re-render"
                    )
                if answer != "y":
                    raise SystemExit(0)
                shutil.rmtree(self.proc_root)

        if render_files:
            self.proc_root.mkdir(parents=True, exist_ok=True)
            self._render_to_disk(resume_from)
            log.info("Finished rendering %d chunks", self.total_chunks)
        else:
            if not self.proc_root.exists():
                raise FileNotFoundError(
                    f"render_files=False but no rendered dataset at "
                    f"{self.proc_root}; run generate_dataset.py (or set "
                    "render_files=True) first"
                )
            # count only numeric index dirs: stray entries (.DS_Store,
            # partial renders) must not inflate the chunk count
            self.total_chunks = len(
                [d for d in self.proc_root.iterdir()
                 if d.is_dir() and d.name.isdigit()]
            )
        log.info("Total chunks: %d", self.total_chunks)

    def _render_to_disk(self, resume_from: int = 0):
        rng = np.random.default_rng([self.seed, self._mode_salt])
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), self._mode_salt)
        done = 0
        batch_idx = 0
        while done < self.total_chunks:
            n = min(self.render_batch_size, self.total_chunks - done)
            chunks = self._chunk_batch(rng, n)
            if done + n <= resume_from:
                # resume fast-forward: the chunk draw above keeps the
                # host rng stream identical to an uninterrupted run;
                # only the (already on disk) device render is skipped
                done += n
                batch_idx += 1
                continue
            wet, dry, dl, wl = self._render_batch(
                jax.random.fold_in(key, batch_idx), chunks
            )
            for i in range(n):
                out = self.proc_root / str(done + i)
                out.mkdir(exist_ok=True)
                write_wav(out / "input.wav", wet[i], self.sample_rate)
                write_wav(out / "target.wav", dry[i], self.sample_rate)
                _save_labels(out / "dry_effects.pt", dl[i])
                _save_labels(out / "wet_effects.pt", wl[i])
            done += n
            batch_idx += 1
            if batch_idx % 16 == 0:
                log.info("rendered %d/%d %s chunks",
                         done, self.total_chunks, self.mode)

    def __getitem__(self, idx: int):
        # in-memory cache: rendered datasets are a few hundred MB while
        # epochs revisit every item; consumers np.stack() copies so the
        # cached arrays are never mutated. REMFX_DATASET_CACHE=0 disables
        # (e.g. when training against a dataset larger than host RAM).
        cache = getattr(self, "_item_cache", None)
        if cache is None:
            enabled = os.environ.get("REMFX_DATASET_CACHE", "1") != "0"
            cache = self._item_cache = {} if enabled else False
        if cache is not False and idx in cache:
            return cache[idx]
        d = self.proc_root / str(idx)
        wet, _ = read_wav(d / "input.wav")
        dry, _ = read_wav(d / "target.wav")
        item = (
            wet,
            dry,
            _load_labels(d / "dry_effects.pt"),
            _load_labels(d / "wet_effects.pt"),
        )
        if cache is not False:
            cache[idx] = item
        return item


class DeviceCachedDataset:
    """Device-resident copy of an offline dataset (HBM data cache).

    On the tunneled TPU backend every per-step host->device batch upload
    pays RPC latency + transfer: measured 3.1 s/step for a DCUNet batch
    (8 x 262144 fp32 wet+dry) whose pure compute is 0.33 s — the true
    cause of round-3's "bf16 step-time regression" (PERF_NOTES #19 was
    only half the story). The renders were PRODUCED on device, so
    shipping them host->disk->host->device per step is pure waste. This
    wrapper bulk-loads the whole dataset into HBM once and serves
    batches as on-device gathers (one jitted ``take`` per batch, zero
    host traffic). Audio is stored bf16 (halves the one-time transfer;
    ~1e-3 relative quantization, far below effect-render magnitudes)
    and cast back to fp32 on gather so downstream dtype semantics are
    unchanged; labels stay fp32.

    No reference analogue: torch DataLoaders feed CUDA from host RAM
    per batch (remfx/datasets.py:623-673) — on a local PCIe GPU that is
    cheap, through a network tunnel it dominates the step.
    """

    def __init__(self, ds, *, keep_dry: bool = True, store_dtype="bfloat16"):
        import jax
        import jax.numpy as jnp

        self._len = len(ds)
        items = [ds[i] for i in range(self._len)]
        wet, dry, dl, wl = (np.stack(col) for col in zip(*items))
        if not keep_dry:
            # classifier task reads only (wet, wet_labels): don't spend
            # HBM on targets (a 4096-chunk cache would double to 8.6 GB)
            dry = np.zeros((self._len, 1, 1), np.float32)
        sd = jnp.dtype(store_dtype)
        self._store = (
            jnp.asarray(wet, sd), jnp.asarray(dry, sd),
            jnp.asarray(dl), jnp.asarray(wl),
        )

        def take(store, idx):
            w, d, a, b = (jnp.take(c, idx, axis=0) for c in store)
            return (w.astype(jnp.float32), d.astype(jnp.float32), a, b)

        self._take = jax.jit(take)

    def __len__(self):
        return self._len

    def get_batch(self, idx):
        import jax.numpy as jnp

        return self._take(self._store, jnp.asarray(np.asarray(idx)))

    def __getitem__(self, i: int):
        w, d, a, b = self.get_batch([int(i)])
        return np.asarray(w[0]), np.asarray(d[0]), np.asarray(a[0]), \
            np.asarray(b[0])


class DynamicEffectDataset(_RenderedBase):
    """On-the-fly rendering (reference DynamicEffectDataset,
    datasets.py:205-330): every access renders fresh random examples —
    no disk. Batched device rendering via ``get_batch``; ``__getitem__``
    exists for single-example parity."""

    def __init__(self, *, device_resident: bool = False, **kw):
        kw.pop("render_files", None)
        kw.pop("render_root", None)
        kw.pop("render_batch_size", None)
        super().__init__(**kw)
        self._epoch = 0
        # keep fresh renders in HBM end-to-end (see _render_batch): the
        # training consumer is jitted, so numpy round-tripping through
        # the tunneled backend costs ~2 min/batch of pure transfer
        self.device_resident = bool(device_resident)

    def set_epoch(self, epoch: int):
        self._epoch = int(epoch)

    def get_batch(self, indices):
        rng = np.random.default_rng(
            [self.seed, self._mode_salt, self._epoch, int(indices[0])]
        )
        chunks = self._chunk_batch(rng, len(indices))
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(self.seed), self._mode_salt),
            self._epoch * 1_000_003 + int(indices[0]),
        )
        return self._render_batch(key, chunks, device=self.device_resident)

    def __getitem__(self, idx: int):
        # single-example parity path: always return numpy (matching every
        # other dataset's __getitem__) regardless of device_resident, so a
        # np.stack collate can never trigger a hidden device readback
        rng = np.random.default_rng(
            [self.seed, self._mode_salt, self._epoch, int(idx)]
        )
        chunks = self._chunk_batch(rng, 1)
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(self.seed), self._mode_salt),
            self._epoch * 1_000_003 + int(idx),
        )
        wet, dry, dl, wl = self._render_batch(key, chunks, device=False)
        return wet[0], dry[0], dl[0], wl[0]


class InferenceDataset:
    """Paired clean/effected reader (reference InferenceDataset,
    datasets.py:588-620): resample to target rate, mono-sum, pad/trim
    effected to clean; labels zeros (dry) / ones (wet)."""

    def __init__(self, root, sample_rate: int, **_):
        self.root = Path(root)
        self.sample_rate = int(sample_rate)
        self.clean_paths = sorted(self.root.glob("clean/*.wav"))
        self.effected_paths = sorted(self.root.glob("effected/*.wav"))

    def __len__(self):
        return len(self.clean_paths)

    def __getitem__(self, idx: int):
        from remfx_tpu.ops.resample import resample

        def load(path):
            x, sr = read_wav(path)
            if sr != self.sample_rate:
                x = np.asarray(resample(x, sr, self.sample_rate), np.float32)
            return x.sum(0, keepdims=True)

        clean = load(self.clean_paths[idx])
        effected = load(self.effected_paths[idx])
        t = clean.shape[-1]
        if effected.shape[-1] > t:
            effected = effected[:, :t]
        elif effected.shape[-1] < t:
            effected = np.pad(effected, [(0, 0), (0, t - effected.shape[-1])])
        n = len(ALL_EFFECTS)
        return (
            effected.astype(np.float32),
            clean.astype(np.float32),
            np.zeros(n, np.float32),
            np.ones(n, np.float32),
        )


class EffectDatamodule:
    """Three loaders over (train, val, test) with the reference's
    batch-size conventions (train==val batch size, datasets.py:623-673).
    Loaders yield ``(wet, dry, dry_labels, wet_labels)`` numpy batches;
    datasets exposing ``get_batch`` (dynamic) render whole batches on
    device in one shot."""

    def __init__(self, train_dataset, val_dataset, test_dataset, *,
                 train_batch_size: int, test_batch_size: int,
                 seed: int = 12345, **_):
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.test_dataset = test_dataset
        self.train_batch_size = int(train_batch_size)
        self.test_batch_size = int(test_batch_size)
        self.seed = int(seed)
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Fast-forward the shuffle/render epoch counter (auto-resume:
        a resumed run must continue the data sequence, not replay
        epochs 1..N it already consumed)."""
        self._epoch = int(epoch)
        if hasattr(self.train_dataset, "set_epoch"):
            self.train_dataset.set_epoch(self._epoch)

    def _iterate(self, dataset, batch_size: int, shuffle: bool):
        n = len(dataset)
        order = np.arange(n)
        if shuffle:
            order = np.random.default_rng([self.seed, self._epoch]).permutation(n)
        for start in range(0, n, batch_size):
            idx = order[start : start + batch_size]
            if hasattr(dataset, "get_batch"):
                yield dataset.get_batch(idx)
            else:
                items = [dataset[int(i)] for i in idx]
                yield tuple(np.stack(col) for col in zip(*items))

    def train_dataloader(self):
        self._epoch += 1
        if hasattr(self.train_dataset, "set_epoch"):
            self.train_dataset.set_epoch(self._epoch)
        return self._iterate(self.train_dataset, self.train_batch_size, True)

    def val_dataloader(self):
        return self._iterate(self.val_dataset, self.train_batch_size, False)

    def test_dataloader(self):
        return self._iterate(self.test_dataset, self.test_batch_size, False)

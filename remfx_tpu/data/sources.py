"""Source-dataset scanners, splits, and chunk sampling.

Covers the reference's split tables + ``locate_files`` (remfx/
datasets.py:23-106) and ``select_random_chunk`` (remfx/utils.py:120-135),
torch/torchaudio-free: wav IO is numpy (data/wav.py) and resampling is
the JAX polyphase resampler (ops/resample.py) so chunk prep runs on
device. Adds a deterministic synthetic source (sines + filtered noise)
so tests and demos need no downloads.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from remfx_tpu.data.wav import read_wav
from remfx_tpu.utils.logging import get_logger

log = get_logger(__name__)

# Split tables (reference remfx/datasets.py:23-56).
VOCALSET_SPLITS = {
    "train": [f"male{i}" for i in range(1, 10)]
    + [f"female{i}" for i in range(1, 8)],
    "val": ["male10", "female8"],
    "test": ["male11", "female9"],
}
GUITARSET_SPLITS = {"train": ["00", "01", "02", "03"], "val": ["04"], "test": ["05"]}
DSD100_SPLITS = {"train": ["train"], "val": ["val"], "test": ["test"]}
IDMT_DRUMS_SPLITS = {
    "train": ["WaveDrum02", "TechnoDrum01"],
    "val": ["RealDrum01"],
    "test": ["TechnoDrum02", "WaveDrum01"],
}


def locate_files(root, mode: str) -> list[list[str]]:
    """Scan ``root`` for the four starter datasets; one sorted path list
    per dataset found (reference remfx/datasets.py:59-106)."""
    root = Path(root)
    out: list[list[str]] = []

    vocalset = root / "VocalSet1-2"
    if vocalset.is_dir():
        files: list[str] = []
        for singer_dir in (vocalset / "data_by_singer").glob("*"):
            if singer_dir.name in VOCALSET_SPLITS[mode]:
                files += [str(p) for p in singer_dir.glob("*/*/*.wav")]
        log.info("Found %d files in VocalSet %s.", len(files), mode)
        out.append(sorted(files))

    guitarset = root / "audio_mono-mic"
    if guitarset.is_dir():
        files = [
            str(p)
            for p in guitarset.glob("*.wav")
            if p.name.split("_")[0] in GUITARSET_SPLITS[mode]
        ]
        log.info("Found %d files in GuitarSet %s.", len(files), mode)
        out.append(sorted(files))

    dsd = root / "DSD100" / "DSD100"
    if dsd.is_dir():
        files = [str(p) for p in (dsd / mode).rglob("*.wav")]
        log.info("Found %d files in DSD100 %s.", len(files), mode)
        out.append(sorted(files))

    idmt = root / "IDMT-SMT-DRUMS-V2"
    if idmt.is_dir():
        files = [
            str(p)
            for p in (idmt / "audio").glob("*.wav")
            if p.name.split("_")[0] in IDMT_DRUMS_SPLITS[mode]
        ]
        log.info("Found %d files in IDMT-SMT-Drums %s.", len(files), mode)
        out.append(sorted(files))

    return out


def select_random_chunk(
    rng: np.random.Generator, audio_file: str, chunk_size: int, sample_rate: int
) -> np.ndarray | None:
    """Random energy-gated chunk from a file, resampled to ``sample_rate``.

    Returns ``(channels, chunk_size)`` float32 or None when the file is
    too short or the chunk is near-silent (mean |x| < 1e-4), mirroring
    the reference's rejection loop (remfx/utils.py:120-135).
    """
    audio, sr = read_wav(audio_file)
    src_chunk = int(chunk_size * (sr / sample_rate))
    if src_chunk >= audio.shape[-1]:
        return None
    start = int(rng.integers(0, audio.shape[-1] - src_chunk))
    chunk = audio[:, start : start + src_chunk]
    if np.mean(np.abs(chunk)) < 1e-4:
        return None
    if sr != sample_rate:
        from remfx_tpu.ops.resample import resample  # lazy: pulls in jax

        chunk = np.asarray(resample(chunk, sr, sample_rate), np.float32)
    return np.asarray(chunk[:, :chunk_size], np.float32)


def synthetic_chunk(
    rng: np.random.Generator, chunk_size: int, sample_rate: int
) -> np.ndarray:
    """Deterministic synthetic source chunk ``(1, chunk_size)``: a few
    enveloped harmonics plus band-limited noise — spectrally rich enough
    for the MRSTFT redraw check and classifier training, with no
    downloads (SURVEY.md §4 test-strategy point (d))."""
    t = np.arange(chunk_size, dtype=np.float32) / sample_rate
    x = np.zeros(chunk_size, np.float32)
    f0 = float(rng.uniform(80.0, 500.0))
    for h in range(1, 5):
        amp = float(rng.uniform(0.1, 0.5)) / h
        phase = float(rng.uniform(0, 2 * np.pi))
        x += amp * np.sin(2 * np.pi * f0 * h * t + phase).astype(np.float32)
    # slow tremolo envelope so energy varies like real material
    env_rate = float(rng.uniform(0.5, 4.0))
    env = 0.6 + 0.4 * np.sin(2 * np.pi * env_rate * t).astype(np.float32)
    x *= env
    noise = rng.standard_normal(chunk_size).astype(np.float32)
    a = float(rng.uniform(0.8, 0.99))  # one-pole lowpass -> band-limited noise
    x += 0.05 * _one_pole(noise, a, float(np.sqrt(1 - a * a)))
    peak = np.max(np.abs(x)) + 1e-9
    return (0.5 * x / peak)[None, :].astype(np.float32)


def _one_pole(x: np.ndarray, a: float, b: float) -> np.ndarray:
    """y[n] = a y[n-1] + b x[n] in O(T log T) via FFT of the truncated
    exponential kernel (numerically exact to float32 for |a|<1)."""
    n = x.shape[-1]
    # kernel decays below float32 eps after log(eps)/log(a) taps
    klen = min(n, max(16, int(np.ceil(np.log(1e-9) / np.log(max(a, 1e-6))))))
    k = b * np.power(a, np.arange(klen, dtype=np.float64))
    size = 1 << int(np.ceil(np.log2(n + klen)))
    y = np.fft.irfft(np.fft.rfft(x, size) * np.fft.rfft(k, size), size)[:n]
    return y.astype(np.float32)


class ChunkSource:
    """Uniform interface over starter datasets vs synthetic material.

    ``sample(rng)`` -> mono ``(1, chunk_size)`` float32 chunk, retrying
    on energy-gate rejection like the reference's ``while chunk is
    None`` loop (remfx/datasets.py:428-441).
    """

    def __init__(self, root, mode: str, chunk_size: int, sample_rate: int,
                 synthetic: bool = False):
        self.chunk_size = int(chunk_size)
        self.sample_rate = int(sample_rate)
        self.synthetic = bool(synthetic) or root is None
        self.root = root
        self.mode = mode
        self.files: list[list[str]] = []
        if not self.synthetic:
            self.files = [fl for fl in locate_files(root, mode) if fl]
            # missing source data only matters if a chunk is actually
            # drawn — eval runs over pre-rendered datasets
            # (render_files=False) construct the dataset without any
            # starter audio present, like the reference's glob-only
            # locate_files (remfx/datasets.py:23-56)

    def sample(self, rng: np.random.Generator) -> np.ndarray:
        if self.synthetic:
            return synthetic_chunk(rng, self.chunk_size, self.sample_rate)
        if not self.files:
            raise FileNotFoundError(
                f"no starter datasets under {self.root!r} for "
                f"mode={self.mode!r}; run scripts/download.py or set "
                "datamodule.synthetic=true"
            )
        chunk = None
        while chunk is None:
            dataset = self.files[int(rng.integers(0, len(self.files)))]
            path = dataset[int(rng.integers(0, len(dataset)))]
            chunk = select_random_chunk(
                rng, path, self.chunk_size, self.sample_rate
            )
        if chunk.shape[0] > 1:  # sum to mono (reference datasets.py:439-441)
            chunk = chunk.sum(0, keepdims=True)
        if chunk.shape[-1] < self.chunk_size:
            chunk = np.pad(chunk, [(0, 0), (0, self.chunk_size - chunk.shape[-1])])
        return chunk.astype(np.float32)

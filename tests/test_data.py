"""Data-layer tests: directory contract, loaders, scanners, chunking.

Covers the reference's EffectDataset/DynamicEffectDataset/
InferenceDataset/EffectDatamodule semantics (remfx/datasets.py) without
downloads (synthetic source).
"""

import numpy as np
import pytest

from remfx_tpu import ALL_EFFECTS
from remfx_tpu.data import (
    DynamicEffectDataset,
    EffectDatamodule,
    EffectDataset,
    InferenceDataset,
    locate_files,
    select_random_chunk,
    write_wav,
)
from remfx_tpu.data.wav import read_wav

CHUNK = 8192
SR = 48000


def _common(**kw):
    base = dict(
        root=None,
        synthetic=True,
        sample_rate=SR,
        chunk_size=CHUNK,
        effects_to_keep=[],
        effects_to_remove=["distortion", "compressor"],
        num_kept_effects=(0, 0),
        num_removed_effects=(1, 2),
        seed=7,
    )
    base.update(kw)
    return base


def test_effect_dataset_directory_contract(tmp_path):
    ds = EffectDataset(
        total_chunks=3, mode="train", render_files=True,
        render_root=tmp_path, render_batch_size=2, **_common()
    )
    # reference layout: processed/{effects_string}/{mode}/{idx}/...
    # (remfx/datasets.py:370-380, README.md:181-204)
    proc = tmp_path / "processed" / ds.effects_string / "train"
    assert proc.is_dir()
    for i in range(3):
        d = proc / str(i)
        for fname in ("input.wav", "target.wav", "dry_effects.pt",
                      "wet_effects.pt"):
            assert (d / fname).exists(), f"{d / fname} missing"
        wet, sr = read_wav(d / "input.wav")
        dry, _ = read_wav(d / "target.wav")
        assert sr == SR and wet.shape == dry.shape == (1, CHUNK)
    # labels are torch-loadable multi-hot over the removal candidates
    import torch

    wl = torch.load(proc / "0" / "wet_effects.pt", weights_only=True).numpy()
    assert wl.shape == (len(ALL_EFFECTS),)
    removable = {ALL_EFFECTS.index(n) for n in ("distortion", "compressor")}
    assert set(np.flatnonzero(wl)) <= removable and wl.sum() >= 1

    # __getitem__ order: (wet/input, dry/target, dry_labels, wet_labels)
    wet2, dry2, dl, wl2 = ds[0]
    np.testing.assert_allclose(wl2, wl)
    assert wet2.shape == (1, CHUNK)
    assert not np.allclose(wet2, dry2), "wet should differ from dry"


def test_effect_dataset_reuse_without_render(tmp_path):
    kw = dict(total_chunks=2, mode="val", render_root=tmp_path,
              render_batch_size=2, **_common())
    ds = EffectDataset(render_files=True, **kw)
    first = ds[1]
    # render_files=False counts existing dirs (reference datasets.py:453-454)
    ds2 = EffectDataset(render_files=False, **kw)
    assert len(ds2) == 2
    second = ds2[1]
    np.testing.assert_array_equal(first[0], second[0])
    # re-render without consent is refused in non-interactive runs
    with pytest.raises(SystemExit):
        EffectDataset(render_files=True, **kw)


def test_effect_dataset_resume_partial_render(tmp_path, monkeypatch):
    """A render killed mid-way (flaky device tunnel + supervisor kill)
    must resume at the batch boundary and produce a dataset BIT-IDENTICAL
    to an uninterrupted run — rendering is deterministic in
    (seed, mode, batch index) and the host rng stream is fast-forwarded
    through the completed prefix."""
    kw = dict(total_chunks=6, mode="train", render_batch_size=2, **_common())
    full_root = tmp_path / "full"
    EffectDataset(render_files=True, render_root=full_root, **kw)
    proc_full = full_root / "processed"

    part_root = tmp_path / "part"
    EffectDataset(render_files=True, render_root=part_root, **kw)
    proc = next((part_root / "processed").glob("*/train"))
    # simulate the kill: chunks 4,5 never written; chunk 3 ragged
    # (missing its last-written file)
    import shutil

    shutil.rmtree(proc / "4")
    shutil.rmtree(proc / "5")
    (proc / "3" / "wet_effects.pt").unlink()

    ds = EffectDataset(render_files=True, render_root=part_root, **kw)
    assert len(ds) == 6
    full = next(proc_full.glob("*/train"))
    for i in range(6):
        for fname in ("input.wav", "target.wav"):
            a, _ = read_wav(proc / str(i) / fname)
            b, _ = read_wav(full / str(i) / fname)
            np.testing.assert_array_equal(a, b, err_msg=f"{i}/{fname}")


def test_render_heartbeat(tmp_path, monkeypatch):
    """With $REMFX_HEARTBEAT set, every rendered batch touches the
    heartbeat file (the supervisor's liveness signal)."""
    from remfx_tpu.utils import heartbeat

    hb = tmp_path / "hb"
    monkeypatch.setenv("REMFX_HEARTBEAT", str(hb))
    # reset the module's getenv cache (process-wide singleton)
    monkeypatch.setattr(heartbeat, "_checked", False)
    monkeypatch.setattr(heartbeat, "_path", None)
    EffectDataset(total_chunks=2, mode="train", render_files=True,
                  render_root=tmp_path, render_batch_size=2, **_common())
    assert hb.exists()


def test_dynamic_dataset_deterministic_per_epoch():
    ds = DynamicEffectDataset(total_chunks=4, mode="train", **_common())
    a = ds.get_batch([0, 1])
    b = ds.get_batch([0, 1])
    np.testing.assert_array_equal(a[0], b[0])  # same epoch -> same draw
    ds.set_epoch(1)
    c = ds.get_batch([0, 1])
    assert not np.allclose(a[0], c[0]), "new epoch must re-render"
    wet, dry, dl, wl = ds[2]
    assert wet.shape == (1, CHUNK) and wl.shape == (len(ALL_EFFECTS),)


def test_dynamic_dataset_device_resident_parity():
    """device_resident=True keeps fresh renders on device (jax arrays,
    no host readback on the tunneled backend) and is bit-identical to
    the numpy path."""
    import jax

    ds = DynamicEffectDataset(total_chunks=4, mode="train", **_common())
    dev = DynamicEffectDataset(total_chunks=4, mode="train",
                               device_resident=True, **_common())
    a = ds.get_batch([0, 1])
    b = dev.get_batch([0, 1])
    assert all(isinstance(x, jax.Array) for x in b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, np.asarray(y))


def test_inference_dataset_pad_trim_labels(tmp_path):
    rng = np.random.default_rng(0)
    (tmp_path / "clean").mkdir()
    (tmp_path / "effected").mkdir()
    clean = rng.standard_normal((1, 4000)).astype(np.float32) * 0.1
    longer = rng.standard_normal((2, 5000)).astype(np.float32) * 0.1
    write_wav(tmp_path / "clean" / "a.wav", clean, SR)
    write_wav(tmp_path / "effected" / "a.wav", longer, SR)
    ds = InferenceDataset(tmp_path, SR)
    wet, dry, dl, wl = ds[0]
    assert wet.shape == dry.shape == (1, 4000)  # mono-summed + trimmed
    assert dl.sum() == 0 and wl.sum() == len(ALL_EFFECTS)


def test_datamodule_batching_and_shuffle(tmp_path):
    train = DynamicEffectDataset(total_chunks=6, mode="train", **_common())
    val = DynamicEffectDataset(total_chunks=4, mode="val", **_common())
    dm = EffectDatamodule(train, val, val, train_batch_size=4,
                          test_batch_size=2, seed=3)
    batches = list(dm.train_dataloader())
    assert [b[0].shape[0] for b in batches] == [4, 2]  # keeps the tail
    assert all(b[0].shape[1:] == (1, CHUNK) for b in batches)
    test_batches = list(dm.test_dataloader())
    assert [b[0].shape[0] for b in test_batches] == [2, 2]


def test_locate_files_splits(tmp_path):
    # fabricate the four starter-dataset trees (reference datasets.py:59-106)
    v = tmp_path / "VocalSet1-2" / "data_by_singer"
    for singer in ("male1", "male10", "male11"):
        d = v / singer / "arpeggios" / "straight"
        d.mkdir(parents=True)
        (d / "x.wav").write_bytes(b"")
    g = tmp_path / "audio_mono-mic"
    g.mkdir()
    for pref in ("00", "04", "05"):
        (g / f"{pref}_Song.wav").write_bytes(b"")
    d100 = tmp_path / "DSD100" / "DSD100" / "train" / "song"
    d100.mkdir(parents=True)
    (d100 / "bass.wav").write_bytes(b"")
    idmt = tmp_path / "IDMT-SMT-DRUMS-V2" / "audio"
    idmt.mkdir(parents=True)
    (idmt / "WaveDrum02_x.wav").write_bytes(b"")
    (idmt / "RealDrum01_x.wav").write_bytes(b"")

    train = locate_files(tmp_path, "train")
    assert len(train) == 4
    assert all(len(fl) == 1 for fl in train)
    val = locate_files(tmp_path, "val")
    # val: male10, 04_, no dsd val dir, RealDrum01
    assert [len(fl) for fl in val] == [1, 1, 0, 1]


def test_select_random_chunk_energy_gate(tmp_path):
    rng = np.random.default_rng(0)
    silent = np.zeros((1, 4 * CHUNK), np.float32)
    write_wav(tmp_path / "silent.wav", silent, SR)
    assert select_random_chunk(rng, tmp_path / "silent.wav", CHUNK, SR) is None
    loud = 0.2 * rng.standard_normal((1, 4 * CHUNK)).astype(np.float32)
    write_wav(tmp_path / "loud.wav", loud, SR)
    chunk = select_random_chunk(rng, tmp_path / "loud.wav", CHUNK, SR)
    assert chunk is not None and chunk.shape == (1, CHUNK)
    # too-short file is rejected (chunk >= file length)
    write_wav(tmp_path / "short.wav", loud[:, : CHUNK // 2], SR)
    assert select_random_chunk(rng, tmp_path / "short.wav", CHUNK, SR) is None


def test_select_random_chunk_resamples(tmp_path):
    rng = np.random.default_rng(0)
    loud = 0.2 * rng.standard_normal((1, 8 * CHUNK)).astype(np.float32)
    write_wav(tmp_path / "x.wav", loud, 24000)
    chunk = select_random_chunk(rng, tmp_path / "x.wav", CHUNK, SR)
    assert chunk is not None and chunk.shape[-1] == CHUNK


def test_read_wav_extensible_formats(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE carries the real format tag in the FIRST
    two bytes of the SubFormat GUID (offset fmt+24); misreading it sent
    extensible PCM through the float decoder (garbage audio)."""
    import struct

    def extensible_wav(samples_bytes, channels, rate, bits, sub_tag):
        guid_tail = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, channels, rate,
            rate * channels * bits // 8, channels * bits // 8, bits,
            22, bits, (1 << channels) - 1,
        ) + struct.pack("<H", sub_tag) + guid_tail
        body = (b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(samples_bytes))
                + samples_bytes)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    sr = 48000
    x = (np.sin(np.linspace(0, 20, 480)) * 0.5).astype(np.float32)

    # extensible int16 PCM (sub-format tag 1)
    pcm = (x * 32767).astype("<i2").tobytes()
    p = tmp_path / "ext_pcm16.wav"
    p.write_bytes(extensible_wav(pcm, 1, sr, 16, 1))
    y, rate = read_wav(p)
    assert rate == sr and y.shape == (1, 480)
    np.testing.assert_allclose(y[0], x, atol=1e-3)

    # extensible IEEE float32 (sub-format tag 3)
    p2 = tmp_path / "ext_f32.wav"
    p2.write_bytes(extensible_wav(x.astype("<f4").tobytes(), 1, sr, 32, 3))
    y2, _ = read_wav(p2)
    np.testing.assert_allclose(y2[0], x, atol=1e-6)


def test_chunk_source_lazy_when_only_rendered_data_exists(tmp_path):
    """Eval over a pre-rendered dataset (render_files=False) must not
    require starter audio under the root: missing sources only raise
    when a chunk is actually drawn."""
    from remfx_tpu.data.sources import ChunkSource

    src = ChunkSource(str(tmp_path), "test", 1024, 48000)  # empty root: ok
    with pytest.raises(FileNotFoundError, match="starter"):
        src.sample(np.random.default_rng(0))


def test_eval_set_contract_no_starter_audio(tmp_path):
    """eval.sh contract: a downloaded pre-rendered eval set
    (render_root=RemFX_eval_datasets, render_files=False,
    num_removed_effects=[N,N]) must load WITHOUT any starter audio
    under DATASET_ROOT, routing N-N through the processed-dir key
    (reference scripts/eval.sh:38 + remfx/datasets.py:370-380)."""
    from remfx_tpu.data.datasets import EffectDataset, _effects_string

    effects = ["distortion", "compressor", "reverb", "chorus", "delay"]
    key = _effects_string([], effects, (0, 0), (2, 2))
    proc = tmp_path / "eval_root" / "processed" / key / "test"
    sr = 48000
    for i in range(3):
        d = proc / str(i)
        d.mkdir(parents=True)
        x = (np.sin(np.linspace(0, 10 + i, 4096)) * 0.4).astype(np.float32)
        write_wav(d / "input.wav", x[None], sr)
        write_wav(d / "target.wav", x[None] * 0.5, sr)
        lab = np.zeros(len(ALL_EFFECTS), np.float32)
        _write_labels(d, lab)

    ds = EffectDataset(
        root=str(tmp_path / "no_sources_here"),  # no starter data at all
        sample_rate=sr, chunk_size=4096, total_chunks=3,
        effects_to_keep=[], effects_to_remove=effects,
        num_kept_effects=(0, 0), num_removed_effects=(2, 2),
        shuffle_kept_effects=False, shuffle_removed_effects=True,
        mode="test", render_files=False,
        render_root=str(tmp_path / "eval_root"),
    )
    assert len(ds) == 3
    wet, dry, dl, wl = ds[1]
    assert wet.shape == (1, 4096) and dry.shape == (1, 4096)


def _write_labels(d, lab):
    from remfx_tpu.data.datasets import _save_labels

    _save_labels(d / "dry_effects.pt", lab)
    _save_labels(d / "wet_effects.pt", lab)


def test_datamodule_set_epoch_continues_sequence():
    """Auto-resume fast-forwards the datamodule epoch so a resumed run
    does not replay the shuffle orders of epochs it already consumed."""
    from remfx_tpu.data.datasets import EffectDatamodule

    class _DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return (np.float32(i),)

    a = EffectDatamodule(_DS(), _DS(), _DS(), train_batch_size=8,
                         test_batch_size=8, seed=1)
    orders_fresh = [np.asarray(next(iter(a.train_dataloader()))[0])
                    for _ in range(4)]

    b = EffectDatamodule(_DS(), _DS(), _DS(), train_batch_size=8,
                         test_batch_size=8, seed=1)
    next(iter(b.train_dataloader()))  # epochs 1..2 consumed pre-preemption
    next(iter(b.train_dataloader()))
    b.set_epoch(2)  # resume: continue from epoch 2
    resumed = np.asarray(next(iter(b.train_dataloader()))[0])
    np.testing.assert_array_equal(resumed, orders_fresh[2])


def test_synthetic_chunk_rich_families():
    """Multi-family synthetic source (VERDICT r3 #3): deterministic per
    rng seed, correct shape/level, real-file family only when a vendored
    clip is configured, and family coverage over a seed sweep."""
    import numpy as np
    from remfx_tpu.data.sources import ChunkSource, synthetic_chunk_rich

    a = synthetic_chunk_rich(np.random.default_rng(11), 16384, 48000)
    b = synthetic_chunk_rich(np.random.default_rng(11), 16384, 48000)
    assert np.array_equal(a, b)
    assert a.shape == (1, 16384) and a.dtype == np.float32
    peaks = []
    for i in range(24):
        x = synthetic_chunk_rich(np.random.default_rng(i), 16384, 48000)
        assert np.isfinite(x).all()
        peaks.append(float(np.abs(x).max()))
    assert 0.2 < min(peaks) and max(peaks) < 0.65  # gain-draw range
    # missing real files are dropped at construction, not at sample time
    src = ChunkSource(None, "train", 4096, 48000, synthetic=True, rich=True,
                      real_files=("does_not_exist.wav",))
    assert src.real_files == ()
    assert src.sample(np.random.default_rng(0)).shape == (1, 4096)


def test_render_reuse_env_skips_guard(tmp_path, monkeypatch):
    """REMFX_RENDER_REUSE=1 (set by scripts/supervise.py for relaunched
    children) must reuse a COMPLETE render instead of tripping the
    non-interactive re-render guard — otherwise a supervisor kill after
    rendering finished would make every relaunch exit 1."""
    kw = dict(total_chunks=2, mode="train", render_root=tmp_path,
              render_batch_size=2, **_common())
    ds = EffectDataset(render_files=True, **kw)
    first = ds[0]
    monkeypatch.setenv("REMFX_RENDER_REUSE", "1")
    ds2 = EffectDataset(render_files=True, **kw)
    assert len(ds2) == 2
    np.testing.assert_array_equal(first[0], ds2[0][0])


def test_device_cached_dataset_matches_source(tmp_path):
    """DeviceCachedDataset must serve the same items as the wrapped
    offline dataset (bf16 storage => ~1e-3 relative audio tolerance;
    labels exact), batched via on-device gather."""
    from remfx_tpu.data import DeviceCachedDataset

    kw = dict(total_chunks=4, mode="train", render_root=tmp_path,
              render_batch_size=2, **_common())
    ds = EffectDataset(render_files=True, **kw)
    dc = DeviceCachedDataset(ds)
    assert len(dc) == 4
    wet, dry, dl, wl = dc.get_batch([2, 0])
    w2, d2, a2, b2 = ds[2]
    assert np.asarray(wet).dtype == np.float32
    np.testing.assert_allclose(np.asarray(wet[0]), w2, atol=6e-3, rtol=8e-3)
    np.testing.assert_allclose(np.asarray(dry[1]), ds[0][1], atol=6e-3,
                               rtol=8e-3)
    np.testing.assert_array_equal(np.asarray(wl[0]), b2)
    # classifier mode drops targets to a dummy column
    dc2 = DeviceCachedDataset(ds, keep_dry=False)
    assert dc2.get_batch([1])[1].shape == (1, 1, 1)

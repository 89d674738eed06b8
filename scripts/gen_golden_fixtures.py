#!/usr/bin/env python
"""Vendor golden DSP fixtures (VERDICT r1 #9).

Renders a fixed deterministic input through the C++ oracle
(native/refdsp.cpp, JUCE/pedalboard semantics) over a small parameter
grid and saves the outputs to tests/fixtures/golden_dsp.npz. The
fixture-based tests (tests/test_golden_fixtures.py) then catch JAX
renderer regressions without rebuilding the oracle — and when real
pedalboard is ever available, the same grid can be re-rendered against
it to validate the oracle itself (provenance notes in PARITY.md).

Deterministic by construction; rerunning must reproduce the file
bit-for-bit on the same platform.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from remfx_tpu.compat import native_oracle as oracle  # noqa: E402

SR = 48000
T = 24000  # 0.5 s

GRID = {
    "distortion": [dict(drive_db=8.0), dict(drive_db=15.0),
                   dict(drive_db=25.0)],
    "delay": [dict(delay_seconds=0.11, feedback=0.3, mix=0.35),
              dict(delay_seconds=0.25, feedback=0.55, mix=0.7)],
    "compressor": [
        dict(threshold_db=-30.0, ratio=4.0, attack_ms=5.0, release_ms=100.0),
        dict(threshold_db=-20.0, ratio=8.0, attack_ms=1.0, release_ms=30.0),
        dict(threshold_db=-42.0, ratio=1.5, attack_ms=50.0, release_ms=250.0),
    ],
    "limiter": [dict(threshold_db=-12.0, release_ms=80.0),
                dict(threshold_db=-30.0, release_ms=10.0)],
    "chorus": [
        dict(rate_hz=1.0, depth=0.4, centre_ms=7.0, feedback=0.3, mix=0.4),
        dict(rate_hz=0.3, depth=0.25, centre_ms=5.5, feedback=0.15, mix=0.2),
    ],
    "reverb": [
        dict(room_size=0.4, damping=0.5, wet_level=0.3, dry_level=0.7,
             width=0.7),
        dict(room_size=0.9, damping=0.2, wet_level=0.6, dry_level=0.4,
             width=1.0),
    ],
}


def make_input() -> np.ndarray:
    rng = np.random.default_rng(1234)
    x = rng.standard_normal(T).astype(np.float32)
    x = np.convolve(x, np.ones(8) / 8.0, mode="same")
    x *= 0.5 / np.abs(x).max()
    return x.astype(np.float32)


def main():
    x = make_input()
    out = {"input": x, "sample_rate": np.int64(SR)}
    for effect, cases in GRID.items():
        fn = getattr(oracle, "reverb_mono" if effect == "reverb" else effect)
        for i, kw in enumerate(cases):
            args = ([x] if effect == "distortion" else [x, SR])
            y = fn(*args, **kw)
            out[f"{effect}/{i}/output"] = np.asarray(y, np.float32)
            for k, v in kw.items():
                out[f"{effect}/{i}/param/{k}"] = np.float64(v)
    dest = Path(__file__).resolve().parents[1] / "tests" / "fixtures"
    dest.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dest / "golden_dsp.npz", **out)
    size = (dest / "golden_dsp.npz").stat().st_size
    print(f"wrote {dest / 'golden_dsp.npz'} ({size / 1e6:.2f} MB, "
          f"{sum(len(c) for c in GRID.values())} cases)")


if __name__ == "__main__":
    main()

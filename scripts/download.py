#!/usr/bin/env python
"""Download starter datasets (reference scripts/download.py):
    python scripts/download.py vocalset guitarset dsd100 idmt-smt-drums

Requires network access (the build environment has none; run on a
connected machine). DSD100 post-processing mirrors the reference:
keep bass.wav only, re-split 80/10/10.
"""

import shutil
import subprocess
import sys
from pathlib import Path

URLS = {
    "vocalset": "https://zenodo.org/record/1193957/files/VocalSet1-2.zip",
    "guitarset": "https://zenodo.org/record/3371780/files/audio_mono-mic.zip",
    "dsd100": "http://liutkus.net/DSD100.zip",
    "idmt-smt-drums": "https://zenodo.org/record/7544164/files/IDMT-SMT-DRUMS-V2.zip",
}


def download(name: str, root: Path):
    url = URLS[name]
    zip_path = root / Path(url).name
    subprocess.run(["wget", "-c", url, "-O", str(zip_path)], check=True)
    subprocess.run(["unzip", "-o", str(zip_path), "-d", str(root)], check=True)


def postprocess_dsd100(root: Path):
    """Keep bass.wav only; re-split sources 80/10/10 (reference
    scripts/download.py:40-100)."""
    dsd = root / "DSD100" / "DSD100"
    sources = sorted((dsd / "Sources").glob("*/*"))
    keep = []
    for song in sources:
        bass = song / "bass.wav"
        if bass.exists():
            keep.append(bass)
    n = len(keep)
    splits = {
        "train": keep[: int(0.8 * n)],
        "val": keep[int(0.8 * n) : int(0.9 * n)],
        "test": keep[int(0.9 * n) :],
    }
    for mode, files in splits.items():
        out = dsd / mode
        out.mkdir(parents=True, exist_ok=True)
        for f in files:
            dest = out / f"{f.parent.name}_bass.wav"
            shutil.copy(f, dest)


def main():
    root = Path(".")
    names = sys.argv[1:] or list(URLS)
    for name in names:
        if name not in URLS:
            raise SystemExit(f"unknown dataset {name}; have {sorted(URLS)}")
        download(name, root)
        if name == "dsd100":
            postprocess_dsd100(root)


if __name__ == "__main__":
    main()

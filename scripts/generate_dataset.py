#!/usr/bin/env python
"""Render a dataset to disk (reference scripts/generate_dataset.py):
    python scripts/generate_dataset.py +exp=5-5
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from remfx_tpu.utils import runtime  # noqa: E402

runtime.setup()

from remfx_tpu.config.core import parse_cli  # noqa: E402
from remfx_tpu.train.loop import build_datamodule  # noqa: E402


def main():
    cfg = parse_cli(sys.argv[1:])
    build_datamodule(cfg)  # side effect: renders to disk


if __name__ == "__main__":
    main()

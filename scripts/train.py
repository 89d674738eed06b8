#!/usr/bin/env python
"""Train a removal model or classifier.

Usage (mirrors the reference, scripts/train.py):
    python scripts/train.py +exp=chorus
    python scripts/train.py +exp=distortion_aug trainer.max_steps=1000
    python scripts/train.py +exp=5-5_full_cls datamodule.synthetic=true
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from remfx_tpu.utils import runtime  # noqa: E402

runtime.setup()

from remfx_tpu.config.core import parse_cli  # noqa: E402
from remfx_tpu.train.loop import fit  # noqa: E402


def main():
    cfg = parse_cli(sys.argv[1:])
    fit(cfg)


if __name__ == "__main__":
    main()

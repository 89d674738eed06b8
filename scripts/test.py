#!/usr/bin/env python
"""Evaluate a checkpoint (reference scripts/test.py):
    python scripts/test.py +exp=5-5 +ckpt_path=logs/ckpts/.../best
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from remfx_tpu.utils import runtime  # noqa: E402

runtime.setup()

from remfx_tpu.config.core import parse_cli  # noqa: E402
from remfx_tpu.train.loop import test  # noqa: E402


def main():
    cfg = parse_cli(sys.argv[1:])
    test(cfg)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Chain inference over an eval dataset (reference scripts/chain_inference.py):
    python scripts/chain_inference.py +exp=remfx_detect render_files=False \
        num_removed_effects=[2,2]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from remfx_tpu.utils import runtime  # noqa: E402

runtime.setup()

import numpy as np  # noqa: E402

from remfx_tpu.chain.build import build_chain  # noqa: E402
from remfx_tpu.config.core import parse_cli  # noqa: E402
from remfx_tpu.train.loggers import make_logger  # noqa: E402
from remfx_tpu.train.loop import build_datamodule  # noqa: E402
from remfx_tpu.utils.logging import get_logger  # noqa: E402

log = get_logger("chain_inference")


def main():
    cfg = parse_cli(sys.argv[1:])
    datamodule = build_datamodule(cfg)
    first = next(iter(datamodule.test_dataloader()))
    chain = build_chain(cfg, first[0])
    logger = make_logger(cfg.get("logger", "csv"), cfg["logs_dir"], name="chain_inference")
    logger.log_hyperparams(cfg)
    rows = []
    for batch in datamodule.test_dataloader():
        rows.append({k: float(v) for k, v in chain.test_step(batch).items()})
    means = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    logger.log_metrics(means, 0)
    log.info("chain inference results: %s", {k: round(v, 4) for k, v in means.items()})
    logger.close()


if __name__ == "__main__":
    main()

"""Process-zero-aware logging (equivalent of reference remfx/utils.py:12-30)."""

import logging

import jax


def get_logger(name: str = __name__) -> logging.Logger:
    """Python logger that only emits on JAX process 0 (multi-host safe)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("[%(asctime)s][%(name)s][%(levelname)s] %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    if jax.process_index() != 0:  # pragma: no cover - single host in CI
        logger.setLevel(logging.CRITICAL)
    return logger

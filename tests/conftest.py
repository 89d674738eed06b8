"""Test configuration: run on a virtual 8-device CPU mesh by default.

Real-TPU tests are opt-in via the `tpu` marker and RUN_TPU_TESTS=1.
"""

import os

# Must be set before jax import. The session environment pins
# JAX_PLATFORMS=axon (real TPU); tests run on a virtual CPU mesh unless
# RUN_TPU_TESTS is set.
if not os.environ.get("RUN_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compile cache: repeat suite runs skip recompilation (the
# dominant cost of the suite on this 1-vCPU box). The CLI subprocess
# tests keep their own cache (.jax_cache_cli, tests/test_cli.py).
# Keyed by host CPU fingerprint: XLA:CPU AOT entries from a previous
# machine SIGSEGV on load when ISA features differ (seen live; same fix
# as utils/runtime.py).
def _host_fingerprint():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(
                (ln for ln in f if ln.startswith(("flags", "Features"))), ""
            )
    except OSError:
        flags = ""
    return hashlib.sha256(flags.encode()).hexdigest()[:12]


os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), os.pardir,
                 ".jax_cache_tests", _host_fingerprint()),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

if not os.environ.get("RUN_TPU_TESTS"):
    # The axon sitecustomize hook calls jax.config.update("jax_platforms",
    # "axon,cpu") at interpreter start, which overrides the env var — so we
    # override the config value back here, before any backend initializes.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_TPU_TESTS"):
        return
    skip_tpu = pytest.mark.skip(reason="needs real TPU (set RUN_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(12345)

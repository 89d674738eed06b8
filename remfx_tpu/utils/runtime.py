"""Runtime setup: persistent compilation cache + seeding.

The target environment compiles remotely (10-100+ s per jit signature);
the persistent cache makes every signature a one-time cost across
processes. Called by every script entry point.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax


def _host_fingerprint() -> str:
    """Short stable hash of this host's CPU feature flags."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(
                (ln for ln in f if ln.startswith(("flags", "Features"))), ""
            )
    except OSError:
        import platform as _platform

        flags = _platform.processor() or _platform.machine()
    return hashlib.sha256(flags.encode()).hexdigest()[:12]


def setup(cache_dir: str | None = None):
    # The axon sitecustomize pins jax_platforms via jax.config at
    # interpreter start, overriding the JAX_PLATFORMS env var. Honor an
    # explicit REMFX_PLATFORM (e.g. "cpu" for local debugging).
    platform = os.environ.get("REMFX_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    cache = cache_dir or os.environ.get(
        "REMFX_TPU_CACHE", str(Path.cwd() / ".jax_cache")
    )
    # separate caches per backend: XLA:CPU AOT results are machine-
    # feature specific (remote compile machine != host), mixing them
    # risks SIGILL
    backend = platform or os.environ.get("JAX_PLATFORMS", "device").split(",")[0]
    cache = str(Path(cache) / backend)
    if backend == "cpu":
        # ...and per-HOST: a cpu cache written on a box with different
        # ISA features segfaults when its AOT results load here (seen
        # live: SIGSEGV in backend_compile_and_load loading avx512/
        # prefer-no-scatter artifacts on a host without them). Key the
        # cpu cache by the host's feature set so stale-machine entries
        # simply miss.
        cache = str(Path(cache) / _host_fingerprint())
    Path(cache).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the flags
        pass
    # REMFX_WATCHDOG=N: dump all-thread tracebacks to stderr every N
    # seconds — locates silent stalls (remote-compile waits vs host
    # loops) on the tunneled backend, where a hung device RPC shows 0%
    # CPU and no log output.
    watchdog = os.environ.get("REMFX_WATCHDOG")
    if watchdog:
        import faulthandler

        faulthandler.dump_traceback_later(float(watchdog), repeat=True)

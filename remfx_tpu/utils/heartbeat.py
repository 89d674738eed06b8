"""Liveness heartbeat for supervised runs on a flaky device tunnel.

The tunneled TPU backend can wedge a single device RPC indefinitely
(observed: a readback hung >30 min across tunnel flaps while fresh
processes ran ops fine). A hung RPC shows 0% CPU, no log output, and no
exception — the only reliable failure detector is an external process
watching a liveness signal. Hot loops (render batches, train steps)
call :func:`beat`; ``scripts/supervise.py`` kills and relaunches the
run when the heartbeat file goes stale. Reference analogue: Lightning
has no equivalent (CUDA either completes or raises); this is
TPU-tunnel-specific runtime hardening.
"""

from __future__ import annotations

import os

_path: str | None = None
_checked = False


def beat() -> None:
    """Touch the heartbeat file named by ``$REMFX_HEARTBEAT`` (no-op —
    one getenv — when unset). Cost is one utime syscall; callers may
    invoke it every train step."""
    global _path, _checked
    if not _checked:
        _path = os.environ.get("REMFX_HEARTBEAT") or None
        _checked = True
        if _path:
            # create eagerly so the supervisor sees liveness from t=0
            open(_path, "a").close()
    if _path:
        try:
            os.utime(_path, None)
        except FileNotFoundError:
            open(_path, "a").close()

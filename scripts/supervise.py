#!/usr/bin/env python
"""Supervisor for long device-tunnel jobs: kill-and-relaunch on stall.

The tunneled TPU backend can wedge a single RPC indefinitely (0% CPU,
no output, no exception — observed during tunnel flaps). Training and
rendering already survive hard kills: `trainer.auto_resume` restores
the last checkpoint and EffectDataset resumes a partial render at the
batch boundary. This wrapper supplies the missing piece — detecting the
hang: the child process touches $REMFX_HEARTBEAT after every render
batch / train step (remfx_tpu/utils/heartbeat.py); if the file goes
stale for --stall seconds, the child is SIGKILLed and relaunched, up to
--retries times. The child's exit code is passed through.

Usage:
    python scripts/supervise.py [--stall 600] [--retries 8] -- \
        python scripts/train.py +exp=reverb_aug trainer.auto_resume=true ...

No reference analogue (Lightning assumes CUDA either completes or
raises); this is runtime hardening for the remote-device deployment
model, same spirit as SURVEY §5.3 failure detection.
"""

import argparse
import os
import signal
import subprocess
import sys
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stall", type=float, default=600.0,
                    help="seconds without a heartbeat before the child "
                         "is killed (default 600; first heartbeat is "
                         "exempted via --grace)")
    ap.add_argument("--grace", type=float, default=2400.0,
                    help="stall allowance before the FIRST heartbeat "
                         "(cold remote compiles legitimately take tens "
                         "of minutes; default 2400)")
    ap.add_argument("--retries", type=int, default=8,
                    help="max relaunches after stalls (default 8)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the command to supervise")
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (pass it after --)")

    hb = tempfile.NamedTemporaryFile(prefix="remfx_hb_", delete=False)
    hb.close()
    # REMFX_RENDER_REUSE: a relaunch after a kill must reuse a complete
    # render instead of tripping EffectDataset's re-render guard
    env = dict(os.environ, REMFX_HEARTBEAT=hb.name, REMFX_RENDER_REUSE="1")

    attempt = 0
    while True:
        attempt += 1
        start = time.time()
        os.utime(hb.name, None)
        child = subprocess.Popen(cmd, env=env)
        beaten = False
        try:
            while True:
                rc = child.poll()
                if rc is not None:
                    if rc != 0:
                        sys.exit(rc)
                    os.unlink(hb.name)
                    return
                age = time.time() - os.stat(hb.name).st_mtime
                if not beaten:
                    beaten = os.stat(hb.name).st_mtime > start + 1
                limit = args.stall if beaten else max(args.stall, args.grace)
                if age > limit:
                    print(
                        f"[supervise] heartbeat stale {age:.0f}s "
                        f"(limit {limit:.0f}s); killing attempt "
                        f"{attempt}/{args.retries + 1}",
                        file=sys.stderr, flush=True,
                    )
                    child.send_signal(signal.SIGKILL)
                    child.wait()
                    break
                time.sleep(min(30.0, args.stall / 4))
        except KeyboardInterrupt:
            child.send_signal(signal.SIGKILL)
            child.wait()
            raise
        if attempt > args.retries:
            print("[supervise] retry budget exhausted", file=sys.stderr)
            sys.exit(75)  # EX_TEMPFAIL
        print(f"[supervise] relaunching: {' '.join(cmd)}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()

"""Launch a command once the tunneled TPU is actually reachable.

The axon tunnel wedges silently after a worker crash/kill: the next process
hangs forever on its first device op (main thread in futex, tunnel thread in
ep_poll).  This wrapper probes with a tiny matmul in a TIMEOUT-GUARDED
subprocess, retrying until the probe round-trips, and only then execs the
real command.

Usage: python tools/tpu_run.py [--probe-timeout 120] [--max-wait 1800] -- cmd ...
"""
import argparse
import os
import subprocess
import sys
import time

PROBE = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128, 128));"
    "print(float((x @ x).sum()))"
)


def probe_once(timeout: float) -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE],
            timeout=timeout,
            capture_output=True,
        )
        return out.returncode == 0 and b"2097152" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_healthy(probe_timeout: float, max_wait: float) -> bool:
    t0 = time.monotonic()
    attempt = 0
    while time.monotonic() - t0 < max_wait:
        attempt += 1
        if probe_once(probe_timeout):
            print(f"[tpu_run] probe ok (attempt {attempt})", flush=True)
            return True
        print(
            f"[tpu_run] probe failed (attempt {attempt}); waiting 60s "
            f"({time.monotonic() - t0:.0f}s elapsed)",
            flush=True,
        )
        time.sleep(60)
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe-timeout", type=float, default=120.0)
    ap.add_argument("--max-wait", type=float, default=1800.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (use: tpu_run.py -- cmd args...)")
    if not wait_healthy(args.probe_timeout, args.max_wait):
        print("[tpu_run] TPU never became healthy", flush=True)
        return 3
    os.execvp(cmd[0], cmd)


if __name__ == "__main__":
    sys.exit(main())

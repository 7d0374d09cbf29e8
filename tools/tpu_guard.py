"""Stall-watchdog runner for TPU jobs over the flaky axon tunnel.

Observed failure mode (round 4, twice): a long-lived training process stops
making progress mid-run — the client blocks forever on a device op
(futex wait, zero CPU) that the tunneled worker will never answer.  No
exception is raised, so in-process timeouts can't help, and a plain
`timeout <cap>` wastes the whole remaining cap on a job that died 10
minutes in.

This guard runs the command as a subprocess with its output appended to a
log file and watches the LOG FILE's mtime as the liveness signal (the CLIs
log every epoch / sample batch).  If the log goes quiet for --stall
seconds, the child is killed and the command is re-run — commands must be
IDEMPOTENT/RESUMABLE (the product CLIs are: `--mode resume` continues from
the last checkpoint, measure reuses its PNG cache, the latent store is
sentinel-keyed).  A tunnel probe (subprocess, killable) gates every
(re)start because the kill itself wedges the tunnel for minutes.

Usage:
  python tools/tpu_guard.py --log /tmp/job.log [--stall 900] [--retries 3] \
      [--cap 7200] -- <command...>

Exit: the child's rc on success path; 17 if every retry stalled/failed.
This tool imports no jax and never touches the tunnel itself (the probe
runs in short-lived subprocesses).
"""

import argparse
import os
import subprocess
import sys
import time

PROBE = ("import jax, jax.numpy as jnp; "
         "x = jnp.ones((128,128)); print(float((x@x).sum()))")


def log(msg: str) -> None:
    print(f"[guard +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()


def probe_loop(attempts: int = 3) -> bool:
    """At most a few attempts, then let the caller proceed anyway: a
    SUCCESSFUL probe's own exit re-wedges the tunnel for minutes (r5
    postmortem), so probing until success just wastes wedge windows —
    the child's first device op blocks until the wedge clears, and the
    log-silence watchdog covers the true-hang case.  The probe's only
    remaining job is distinguishing 'tunnel alive recently' from 'dead
    all along' in the logs."""
    for i in range(attempts):
        try:
            subprocess.run([sys.executable, "-c", PROBE], timeout=120,
                           check=True, capture_output=True)
            log(f"probe ok (attempt {i})")
            return True
        except Exception as e:  # noqa: BLE001
            log(f"probe failed ({type(e).__name__}); sleeping 45s")
            time.sleep(45)
    log("probe not confirmed; proceeding anyway (first device op blocks "
        "until the wedge clears; stall watchdog covers hangs)")
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--stall", type=float, default=900.0,
                    help="seconds of log silence before the child is "
                         "declared hung (cover the longest cold compile)")
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--cap", type=float, default=7200.0,
                    help="total wall-clock budget across all attempts")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given after --")

    for attempt in range(args.retries + 1):
        if time.time() - T0 > args.cap:
            log("total cap exhausted")
            return 17
        if not probe_loop():
            log("tunnel never came up")
            return 17
        log(f"attempt {attempt}: {' '.join(cmd)}")
        with open(args.log, "ab", buffering=0) as lf:
            lf.write(f"\n===== guard attempt {attempt} =====\n".encode())
            child = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT)
            stalled = False
            while child.poll() is None:
                time.sleep(15)
                quiet = time.time() - os.path.getmtime(args.log)
                over_cap = time.time() - T0 > args.cap
                if quiet > args.stall or over_cap:
                    why = "cap exhausted" if over_cap else f"quiet {quiet:.0f}s"
                    log(f"attempt {attempt}: child hung ({why}); killing")
                    child.kill()
                    child.wait()
                    stalled = True
                    break
        if not stalled:
            rc = child.returncode
            log(f"attempt {attempt}: child exited rc={rc}")
            if rc == 0:
                return 0
        # killed or failed: next attempt re-probes (the kill wedges the
        # tunnel) and re-runs; resumable commands continue where they left off
    log("all attempts exhausted")
    return 17


if __name__ == "__main__":
    raise SystemExit(main())

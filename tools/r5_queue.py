"""Round-5 consolidated TPU task queue (VERDICT r4 ask #8).

One sentinel-per-task resumable queue replacing the accumulated per-round
`r*_queue*.sh` scripts: every round-5 evidence task is declared HERE, each
runs under tools/tpu_guard.py (tunnel probe + log-silence watchdog +
resumable retries), and per-task status lands machine-readably in
sweep_logs/r5/queue_state.json as it happens — "what ran, what's pending,
what failed" is auditable without reading BASELINE.md prose.

Semantics (mirrors utils/sweep.py's sentinel discipline):
- a task with sweep_logs/r5/<name>.done is skipped (delete the sentinel to
  force a rerun),
- a task failure (guard rc != 0) records the failure and CONTINUES to the
  next task — later evidence must not die queued behind an earlier failure,
- `--status` prints the task table without running anything,
- `--only a,b` / `--skip c` select subsets.

Usage:
  python tools/r5_queue.py [--status] [--only t1,t2] [--skip t3]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_DIR = os.path.join(REPO, "sweep_logs", "r5")
STATE_FILE = os.path.join(STATE_DIR, "queue_state.json")
LOG_DIR = os.path.join(STATE_DIR, "logs")

# (name, argv, stall_s, cap_s) — priority order. argv runs from REPO root.
TASKS = [
    # warm the bench compile cache first: de-risks the driver's BENCH_r05
    # capture and validates the new dual-metric emit on the real chip.
    # The VM reset wiped ~/.cache/villan_jax, so the first warm compiles
    # everything from zero — raise bench.py's internal deadline well past
    # the cold-compile time (the driver's own capture keeps the default
    # 450 s and rides this run's cache entries).
    ("bench_warm", ["env", "VILLAN_BENCH_DEADLINE=1800",
                    sys.executable, "bench.py"], 600, 2000),
    # VERDICT ask #1: the canonical-ODE LDM implant run to scores.  The VM
    # reset between r5 sessions wiped the ep-9 orbax checkpoint AND the
    # latent store (only git-committed configs survived), so the resume
    # finisher (tools/r4_ldm_finish.py) has nothing to resume — this is the
    # FROM-SCRATCH driver: rebuild the latent store (sentinel-keyed), clear
    # the stale config-only run dir, train 40 epochs ODE (ckpt every 8 so a
    # guard kill resumes instead of restarting), UniPC-20 measure at 1024
    # samples, latent_scores.json.
    ("ldm_ode", [sys.executable, "tools/parity_ldm.py",
                 "--epochs", "40", "--solver_type", "ode",
                 "--measure_sample_n", "1024",
                 "--save_model_epochs", "8",
                 "--save_image_epochs", "40"],
     1500, 10800),
    # VERDICT ask #2: CI-qualified trained-VE sweep + scaling point
    ("ve_sweep", [sys.executable, "tools/r5_ve_sweep.py"], 1080, 10800),
    # VERDICT ask #3: LoRA-only implant on a BETTER stage-A backbone.
    # 20k, not the 30k first tried: measured stage-A rate is ~2.9 steps/s
    # (~1.35 h for the 14k continuation from the surviving 6k backbone), and
    # 30k would push stage-B scoring past the round's wall clock — a 3.3x
    # backbone budget with COMPLETE implant scores beats a 5x backbone whose
    # stage B dies unscored at the cap.
    ("lora_stage_a20k", [sys.executable, "tools/parity_cond_lora.py",
                         "--pretrain_steps", "20000",
                         "--implant_steps", "12000",
                         "--implant_lr", "1e-3",
                         "--implant_poison_rate", "0.9"],
     1200, 10800),
    # VERDICT ask #6: FAKE256 at ~20 epochs so inpaint recovery is real
    # (25 was the ask; 20 x 123.7 s/epoch fits the remaining wall clock
    # with the measure + inpaint phase included)
    ("fake256_20ep", [sys.executable, "tools/r4_celeba256.py",
                      "--epochs", "20", "--save_model_epochs", "10"],
     1200, 9000),
    # Follow-up to the r5 finding that a 3.3x backbone + pr0.9 left the
    # LoRA-r4 implant at the 1.44x-contrast plateau (capacity, not backbone
    # quality, binds): one higher-capacity stage-B variant — rank 16 over
    # q/k/v/out, double steps — on the same 20k backbone.
    # 12k, not the 24k first tried: the 24k attempt hit a tunnel hang at
    # step ~19k (true device-op block, 0.3%% CPU) and a full retry would
    # not fit the round; 12k matches the r4/r5 rank-4 budget exactly, so
    # the rank-16 row answers the capacity question like-for-like.
    ("lora_r16", [sys.executable, "tools/parity_cond_lora.py",
                  "--pretrain_steps", "20000",
                  "--implant_steps", "12000",
                  "--implant_lr", "1e-3",
                  "--implant_poison_rate", "0.9",
                  "--lora_r", "16"],
     1200, 4500),
    # VE scaling point (the sweep's phase 2, opt-in): the 2x2 grid configs
    # are sentinel-done, so this runs exactly one 2x-epoch config at the
    # best grid setting (sm10/lr1e-3, 99.0%) for the budget-frontier curve.
    # Left PENDING at round-5 close: its ~1 h did not fit before the
    # driver's bench capture, and the grid already crossed the decisive
    # threshold (99.0% with a CI excluding any floor).
    ("ve_phase2", [sys.executable, "tools/r5_ve_sweep.py",
                   "--phase2_mult", "2"], 1080, 5400),
    # VERDICT ask #7 (VE chunk tuning) is DROPPED from the round-5 queue:
    # the sweep above settles the VE story decisively (99% implant), and the
    # BASELINE.md VE throughput row now headlines the tunnel-safe production
    # number (2.9 imgs/s chunked) per the ask's alternative resolution.
    # last act: leave the compile cache warm for the driver's bench capture
    ("bench_final", ["env", "VILLAN_BENCH_DEADLINE=900",
                     sys.executable, "bench.py"], 300, 1000),
]


def load_state() -> dict:
    if os.path.exists(STATE_FILE):
        with open(STATE_FILE) as f:
            return json.load(f)
    return {}


def save_state(state: dict) -> None:
    os.makedirs(STATE_DIR, exist_ok=True)
    tmp = STATE_FILE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=2)
    os.replace(tmp, STATE_FILE)


def sentinel(name: str) -> str:
    return os.path.join(STATE_DIR, f"{name}.done")


def print_status(state: dict) -> None:
    print(f"{'task':<18} {'status':<10} {'rc':<4} {'runtime':<9} log")
    for name, _argv, _stall, _cap in TASKS:
        rec = state.get(name, {})
        status = ("done" if os.path.exists(sentinel(name))
                  else rec.get("status", "pending"))
        rt = rec.get("runtime_s")
        print(f"{name:<18} {status:<10} {str(rec.get('rc', '')):<4} "
              f"{(f'{rt:.0f}s' if rt else ''):<9} "
              f"{rec.get('log', '')}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--status", action="store_true")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()

    os.makedirs(LOG_DIR, exist_ok=True)
    state = load_state()
    if args.status:
        print_status(state)
        return 0

    only = set(filter(None, args.only.split(",")))
    skip = set(filter(None, args.skip.split(",")))
    failures = 0
    for name, argv, stall, cap in TASKS:
        if only and name not in only:
            continue
        if name in skip:
            continue
        if os.path.exists(sentinel(name)):
            print(f"[r5_queue] {name}: done sentinel exists, skipping",
                  flush=True)
            continue
        log_path = os.path.join(LOG_DIR, f"{name}.log")
        guard = [sys.executable, "tools/tpu_guard.py",
                 "--log", log_path, "--stall", str(stall),
                 "--cap", str(cap), "--"] + argv
        print(f"[r5_queue] {name}: starting (stall {stall}s, cap {cap}s)",
              flush=True)
        state[name] = {"status": "running", "log": log_path,
                       "started": time.time()}
        save_state(state)
        t0 = time.time()
        rc = subprocess.run(guard, cwd=REPO).returncode
        state[name] = {
            "status": "done" if rc == 0 else "failed",
            "rc": rc, "log": log_path,
            "runtime_s": time.time() - t0,
            "finished": time.time(),
        }
        save_state(state)
        print(f"[r5_queue] {name}: rc={rc} ({state[name]['runtime_s']:.0f}s)",
              flush=True)
        if rc == 0:
            with open(sentinel(name), "w") as f:
                f.write(f"rc=0 at {time.time()}\n")
        else:
            failures += 1
    print_status(state)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

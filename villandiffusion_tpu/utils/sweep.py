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

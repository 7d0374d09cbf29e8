"""ANSI logger + JSONL run-metrics logger.

Replaces the reference's Log (/root/reference/util.py:35-84) and its
wandb/tensorboard trackers (SURVEY.md §5.5) with a dependency-free JSONL
metrics stream per run (`metrics.jsonl`), greppable and plottable offline.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class Log:
    _COLORS = {
        "info": "\033[1;32m",
        "warning": "\033[1;33m",
        "error": "\033[1;31m",
        "critical": "\033[1;35m",
    }
    _END = "\033[0m"

    @staticmethod
    def _fmt(level: str, msg: str) -> str:
        return f"{Log._COLORS[level]}[{level.upper()}]{Log._END} {msg}"

    @staticmethod
    def info(msg: str) -> str:
        s = Log._fmt("info", msg)
        print(s)
        return s

    @staticmethod
    def warning(msg: str) -> str:
        s = Log._fmt("warning", msg)
        print(s)
        return s

    @staticmethod
    def error(msg: str) -> str:
        s = Log._fmt("error", msg)
        print(s)
        return s

    @staticmethod
    def critical(msg: str) -> str:
        s = Log._fmt("critical", msg)
        print(s)
        return s


class MetricsLogger:
    """Append-only JSONL metrics (step logs, scores) for a run dir."""

    def __init__(self, run_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(run_dir, exist_ok=True)
        self._path = os.path.join(run_dir, filename)

    def log(self, data: Dict, step: Optional[int] = None) -> None:
        rec = dict(data)
        rec["_time"] = time.time()
        if step is not None:
            rec["_step"] = int(step)
        with open(self._path, "a") as f:
            f.write(json.dumps(rec, default=float) + "\n")

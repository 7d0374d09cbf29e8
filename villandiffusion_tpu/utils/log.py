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


class _TensorBoardTracker:
    """Scalar stream into ``<run_dir>/tb`` (torch SummaryWriter)."""

    def __init__(self, run_dir: str, project: Optional[str], config: Optional[Dict]):
        from torch.utils.tensorboard import SummaryWriter

        self._writer = SummaryWriter(log_dir=os.path.join(run_dir, "tb"))
        if config:
            self._writer.add_text(
                "config", json.dumps(config, default=str, indent=2), 0
            )

    def log(self, scalars: Dict[str, float], step: int) -> None:
        for k, v in scalars.items():
            self._writer.add_scalar(k, v, step)

    def close(self) -> None:
        self._writer.close()


class _WandbTracker:
    """wandb run keyed like the reference (project=config.project, id=run
    name — /root/reference/VillanDiffusion.py:318)."""

    def __init__(self, run_dir: str, project: Optional[str], config: Optional[Dict]):
        import wandb

        name = os.path.basename(os.path.normpath(run_dir))
        self._run = wandb.init(
            project=project or "villandiffusion_tpu",
            name=name, id=name, dir=run_dir, config=config or {},
            resume="allow",
        )

    def log(self, scalars: Dict[str, float], step: int) -> None:
        self._run.log(scalars, step=step)

    def close(self) -> None:
        self._run.finish()


_TRACKERS = {"tensorboard": _TensorBoardTracker, "wandb": _WandbTracker}


class MetricsLogger:
    """Append-only JSONL metrics (step logs, scores) for a run dir, with an
    optional tracker fan-out.

    The JSONL stream is always written (dependency-free, offline-first).
    ``trackers`` — or the ``VILLAN_TRACKERS`` env var, a comma list such as
    ``"tensorboard,wandb"`` — additionally mirrors every numeric value into
    those backends, covering the reference's
    ``accelerate(log_with=["tensorboard", "wandb"])`` surface
    (/root/reference/VillanDiffusion.py:356-367).  A backend that fails to
    import or initialize is skipped with a warning rather than failing the
    run (this environment has no egress, so wandb is usually absent).
    """

    def __init__(
        self,
        run_dir: str,
        filename: str = "metrics.jsonl",
        trackers: Optional[list] = None,
        project: Optional[str] = None,
        config: Optional[Dict] = None,
    ):
        os.makedirs(run_dir, exist_ok=True)
        self._path = os.path.join(run_dir, filename)
        self._step = 0
        self._trackers = []
        if trackers is None:
            env = os.environ.get("VILLAN_TRACKERS", "")
            trackers = [t.strip() for t in env.split(",") if t.strip()]
        for name in trackers:
            cls = _TRACKERS.get(name)
            if cls is None:
                Log.warning(f"unknown tracker {name!r} (have {sorted(_TRACKERS)})")
                continue
            try:
                self._trackers.append(cls(run_dir, project, config))
            except Exception as e:
                Log.warning(f"tracker {name!r} unavailable: {type(e).__name__}: {e}")

    def log(self, data: Dict, step: Optional[int] = None) -> None:
        rec = dict(data)
        rec["_time"] = time.time()
        if step is not None:
            rec["_step"] = int(step)
        with open(self._path, "a") as f:
            f.write(json.dumps(rec, default=float) + "\n")
        if self._trackers:
            cur = int(step) if step is not None else self._step
            # monotonic even when explicit-step and auto-step callers
            # interleave (tracker points would silently collide otherwise)
            self._step = max(self._step, cur + 1)
            scalars = {
                k: float(v)
                for k, v in data.items()
                if isinstance(v, (int, float)) and not isinstance(v, bool)
            }
            if scalars:
                for t in self._trackers:
                    t.log(scalars, cur)

    def close(self) -> None:
        for t in self._trackers:
            try:
                t.close()
            except Exception as e:
                Log.warning(f"tracker close failed: {type(e).__name__}: {e}")

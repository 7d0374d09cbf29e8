"""Memory / profiling instrumentation (reference §5.1 aux subsystem).

Replaces MemoryLog (/root/reference/util.py:86-117) and TorchTracemalloc
(viallanDiffusion_conditional.py:604-648) with host RSS + JAX device-memory
stats; `trace_epoch` is the per-epoch context manager printing deltas and
peaks.  `start_profiler`/`stop_profiler` wrap jax.profiler for on-demand
TensorBoard traces.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional


def host_memory_mb() -> float:
    """Resident set size of this process in MB (no psutil dependency)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device {bytes_in_use, peak_bytes_in_use, ...} in MB."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                k: v / 2**20 for k, v in stats.items() if isinstance(v, (int, float))
            }
    return out


class MemoryLog:
    """Append timestamped host/device memory lines to a log file
    (util.py:86-117 semantics)."""

    def __init__(self, path: str = "memlog.log"):
        self.path = path

    def append(self, tag: str = "") -> str:
        dev = device_memory_stats()
        dev_str = "; ".join(
            f"{name}: {s.get('bytes_in_use', 0):.0f}MB (peak {s.get('peak_bytes_in_use', 0):.0f}MB)"
            for name, s in dev.items()
        )
        line = (
            f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {tag} "
            f"host_rss={host_memory_mb():.0f}MB {dev_str}"
        )
        with open(self.path, "a") as f:
            f.write(line + "\n")
        return line


class trace_epoch:
    """Context manager printing per-epoch host/device memory deltas
    (TorchTracemalloc semantics)."""

    def __init__(self, tag: str = "epoch", log: Optional[MemoryLog] = None):
        self.tag = tag
        self.log = log

    def __enter__(self):
        self.t0 = time.time()
        self.host0 = host_memory_mb()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self.t0
        host1 = host_memory_mb()
        dev = device_memory_stats()
        peak = max(
            (s.get("peak_bytes_in_use", 0.0) for s in dev.values()), default=0.0
        )
        msg = (
            f"[{self.tag}] {dt:.1f}s host {self.host0:.0f}->{host1:.0f}MB "
            f"(+{host1 - self.host0:.0f}) device peak {peak:.0f}MB"
        )
        print(msg)
        if self.log:
            self.log.append(self.tag)
        return False


def start_profiler(logdir: str = "profile") -> None:
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)


def stop_profiler() -> None:
    import jax

    jax.profiler.stop_trace()

"""JAX runtime knobs shared by the CLI entry points."""

from __future__ import annotations

import os


def setup_jax_cache(path: str = None) -> None:
    """Enable the persistent compilation cache (big first-run compiles are
    reused across processes — sweeps, resumes, measure re-runs)."""
    import jax

    path = path or os.environ.get(
        "VILLAN_JAX_CACHE", os.path.expanduser("~/.cache/villan_jax")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

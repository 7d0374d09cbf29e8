"""JAX runtime knobs shared by the CLI entry points."""

from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    """Honor $JAX_PLATFORMS even when a site hook pre-registers another
    backend.

    Some managed environments install a sitecustomize that registers a
    remote TPU plugin and pins ``jax_platforms`` before user code runs,
    which silently overrides ``JAX_PLATFORMS=cpu``.  CLI smoke runs and CI
    need the env var to win (the tests' conftest does the same override)."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        if (jax.config.jax_platforms or "") != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass


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

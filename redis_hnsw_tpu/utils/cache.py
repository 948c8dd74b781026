"""Persistent XLA compilation cache setup.

The batched engines are a handful of large jitted programs (beam loops,
wave construction); first compiles run tens of seconds to minutes on slow
hosts. The persistent cache makes them one-time per machine: measured on
the dev TPU, a scan-of-sorts program went 3.0s -> 0.27s across processes.

Enabled on package import unless the user already configured a cache dir
or set REDIS_HNSW_TPU_NO_CACHE=1.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (default:
    $XDG_CACHE_HOME/redis_hnsw_tpu/jax). Returns the dir, or None if
    disabled/already configured."""
    if os.environ.get("REDIS_HNSW_TPU_NO_CACHE"):
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current  # user already chose one
    if path is None:
        base = os.environ.get(
            "XDG_CACHE_HOME", os.path.expanduser("~/.cache")
        )
        # scope by backend: CPU AOT executables record host CPU features
        # and their loader warns of SIGILL risk even on the same machine
        # (XLA pseudo-features) -- default-on only for accelerator
        # backends, where the minutes-long engine compiles live; CPU
        # users can opt in with an explicit path.
        backend = (
            jax.config.jax_platforms
            or os.environ.get("JAX_PLATFORMS", "default")
        ).split(",")[0]
        if backend == "cpu":
            return None
        path = os.path.join(base, "redis_hnsw_tpu", f"jax-{backend}")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # our programs are worth caching even when they compile fast
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        return None
    return path

"""Persistent XLA compilation cache.

The axon TPU backend compiles through a remote compile server at
~30-120s/program; caching compiled executables under .jax_cache/ makes
repeated bench/driver/tool invocations near-instant.  Call before the
first jit trace.
"""

from __future__ import annotations

import os


def enable_compilation_cache(repo_root: str | None = None) -> None:
    import jax

    if repo_root is None:
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(repo_root, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

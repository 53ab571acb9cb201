"""Persistent XLA compilation cache for TPU benchmark scripts.

The axon remote-compile queue intermittently stalls 10-25+ min per fresh
compile (BASELINE.md "variance warning"); caching compiled executables under
the repo's .jax_cache/ makes re-runs skip the walls entirely. bench.py enables
the same cache inline so the driver's benchmark is covered without importing
this module.
"""
from __future__ import annotations

import os


def enable_compile_cache() -> str:
    """Enable the persistent compilation cache; returns the cache dir."""
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir

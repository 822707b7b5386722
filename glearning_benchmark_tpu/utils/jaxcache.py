"""Persistent XLA compilation cache.

The tunneled TPU backend compiles remotely (client AOT is version-locked
out), and remote compiles occasionally stall. Caching compiled executables
on disk makes every successful compile permanent: retried runs skip straight
past previously-compiled steps, and steady-state jobs never touch the
compile service again.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "GBT_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

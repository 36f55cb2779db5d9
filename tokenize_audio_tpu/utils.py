"""Small shared utilities."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    TPU compiles of the encode program take O(minutes) per (batch, length)
    bucket shape through remote-compile backends; the persistent cache makes
    them one-time per machine. Called by bench.py and every dataset CLI.
    """
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

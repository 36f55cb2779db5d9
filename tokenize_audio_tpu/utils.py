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


class profile_trace:
    """Context manager around jax.profiler.trace — the tracing facility the
    reference lacks entirely (SURVEY §5). View with TensorBoard/XProf.

        with profile_trace("/tmp/trace"):
            engine.encode_batch(audios)
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False

"""Persistent XLA compilation cache.

The cascade programs are large (hundreds of fused ops per image-size bucket)
and first-compile can take minutes on remote-compile backends; the persistent
cache makes every program shape a one-time cost across processes and runs.
Enabled by every app entry point and the benchmark.
"""

from __future__ import annotations

import os

_enabled = False


def enable(cache_dir: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache."""
    global _enabled
    import jax

    path = cache_dir or os.environ.get("RODC_JIT_CACHE", "/tmp/rodc_jit_cache")
    if not _enabled:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    return path

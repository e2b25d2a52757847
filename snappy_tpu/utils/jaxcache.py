"""Persistent XLA compilation cache setup.

The kernel graphs compile slowly (big fused element-wise pipelines), and
this environment's page-fault latency makes compiles even slower, so the
on-disk cache matters for every entry point.  jax 0.9 needs the explicit
config.update calls (env vars alone don't enable it)."""

from __future__ import annotations

import os

_done = False


def setup_compilation_cache(path: str | None = None) -> None:
    global _done
    if _done:
        return
    import jax

    cache_dir = path or os.environ.get(
        "SNAPPY_TPU_JAX_CACHE", "/tmp/snappy_tpu_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _done = True
    except Exception:  # pragma: no cover - older/newer jax naming
        pass

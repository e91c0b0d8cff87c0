"""Shared CLI setup: persistent XLA compilation cache.

First compiles on the TPU runtime take minutes; the cache makes repeat
CLI invocations start in seconds.  NOTE: this JAX build does NOT read
JAX_COMPILATION_CACHE_DIR from the environment (verified: the config
stays None) — the cache only engages through jax.config.update, so this
helper must be called (it is, by every CLI and by bench.py).
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache", "rife_tpu_jit"))
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path

"""Shared CLI setup: persistent XLA compilation cache.

First compiles on the TPU runtime take minutes; the cache makes repeat
CLI invocations start in seconds.  Must run before jax initializes.
"""
from __future__ import annotations

import os


def enable_compilation_cache():
    path = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "rife_tpu_jit"),
    )
    os.makedirs(path, exist_ok=True)

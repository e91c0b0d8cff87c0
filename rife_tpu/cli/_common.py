"""Shared CLI setup.

Persistent-compilation-cache status on this stack (both verified):

- This JAX build does NOT read JAX_COMPILATION_CACHE_DIR from the
  environment (the config stays None), so the env-var-only setup the
  tools used through round 1 never engaged the cache.
- Enabling it via jax.config.update works mechanically but is WORSE
  than useless here: the axon remote-compile service recompiles anyway
  (same graph re-ran cold, 548 s, with a populated cache), and the
  cache WRITE path segfaults intermittently inside
  compilation_cache.put_executable_and_time (reproduced twice in the
  CPU test suite).

So enable_compilation_cache is deliberately a no-op that only keeps the
cache directory convention for any future runtime where the cache is
sound.  Do not re-enable without re-testing both findings.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache", "rife_tpu_jit"))
    os.makedirs(path, exist_ok=True)
    return path

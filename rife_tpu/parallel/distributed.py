"""Multi-host bootstrap (replaces torch.distributed.launch + NCCL init,
reference train.py:138-151, README.md:156-158).

On TPU pods, jax.distributed.initialize() picks up the cluster topology
from the environment; per-host input sharding replaces the reference's
DistributedSampler (each host feeds only its local shard of the global
batch).
"""
from __future__ import annotations

import jax


def _already_initialized() -> bool:
    # Probe the distributed client WITHOUT touching jax.process_count():
    # that would initialize the single-process backend and make a later
    # jax.distributed.initialize() illegal ("must be called before any
    # JAX computation") — caught by tests/test_multihost.py.
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None
    except Exception:  # pragma: no cover - private-API drift
        return False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize multi-host JAX if a cluster is configured; no-op for
    single-process runs.  Returns True when distributed is active."""
    if _already_initialized():
        return jax.process_count() > 1
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    return jax.process_index() == 0

from rife_tpu.parallel.mesh import (make_mesh, batch_sharding,
                                    replicated_sharding, shard_batch,
                                    superbatch_sharding, shard_superbatch)
from rife_tpu.parallel.distributed import initialize_distributed, process_info
from rife_tpu.parallel.spatial import interpolate_batch_sharded, interpolate_spatial

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "superbatch_sharding",
    "shard_superbatch",
    "initialize_distributed",
    "process_info",
    "interpolate_batch_sharded",
    "interpolate_spatial",
]

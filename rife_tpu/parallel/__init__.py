from rife_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch
from rife_tpu.parallel.distributed import initialize_distributed, process_info

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "initialize_distributed",
    "process_info",
]

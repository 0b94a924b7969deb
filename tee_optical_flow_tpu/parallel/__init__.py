from .mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch,
    initialize_distributed, host_shard_list,
)

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "initialize_distributed", "host_shard_list",
]

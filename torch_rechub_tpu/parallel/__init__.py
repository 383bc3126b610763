from .mesh import (
    MeshConfig,
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
    shard_params,
    table_partition_spec,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "table_partition_spec",
    "shard_params",
    "shard_batch",
]

from hypelcnn_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
    spatial_sharding,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "replicated_sharding",
    "shard_batch",
    "spatial_sharding",
]

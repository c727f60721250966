from uno_tpu.parallel.mesh import (
    batch_sharding,
    batch_spatial_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "batch_spatial_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]

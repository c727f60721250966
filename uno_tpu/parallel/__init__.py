from uno_tpu.parallel.distributed import (
    initialize_from_env,
    is_multiprocess,
    process_local_batch,
)
from uno_tpu.parallel.mesh import (
    batch_sharding,
    batch_spatial_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from uno_tpu.parallel.tp import place_state, shard_state_tp, tp_spec

__all__ = [
    "batch_sharding",
    "initialize_from_env",
    "is_multiprocess",
    "process_local_batch",
    "batch_spatial_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "place_state",
    "shard_state_tp",
    "tp_spec",
]

from .seq import sequence_parallel_encode
from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_params_model,
    sync_global_devices,
)

__all__ = [
    "batch_sharding", "make_mesh", "replicate", "shard_batch",
    "shard_params_model", "sync_global_devices", "sequence_parallel_encode",
]

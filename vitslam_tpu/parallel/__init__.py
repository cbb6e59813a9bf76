from .seq import sequence_parallel_encode
from .mesh import (
    batch_sharding,
    make_mesh,
    model_partition_spec,
    replicate,
    shard_batch,
    shard_params_model,
    sync_global_devices,
)
from .spawn import clean_env, free_port, python_worker_argv, spawn_gang

__all__ = [
    "batch_sharding", "make_mesh", "model_partition_spec", "replicate",
    "shard_batch", "shard_params_model", "sync_global_devices",
    "sequence_parallel_encode", "clean_env", "free_port",
    "python_worker_argv", "spawn_gang",
]

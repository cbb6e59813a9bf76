from .checkpoint import (
    CheckpointManager,
    load_checkpoint,
    load_model_params,
    save_checkpoint,
)
from .orbax_ckpt import (
    ShardedCheckpointManager,
    load_sharded,
    save_sharded,
)
from .torch_convert import export_torch_style, import_torch_style

__all__ = [
    "CheckpointManager", "load_checkpoint", "load_model_params",
    "save_checkpoint", "export_torch_style", "import_torch_style",
    "ShardedCheckpointManager", "save_sharded", "load_sharded",
]

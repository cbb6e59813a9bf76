from .checkpoint import (
    CheckpointManager,
    load_checkpoint,
    load_model_params,
    save_checkpoint,
)
from .torch_convert import export_torch_style, import_torch_style

__all__ = [
    "CheckpointManager", "load_checkpoint", "load_model_params",
    "save_checkpoint", "export_torch_style", "import_torch_style",
]

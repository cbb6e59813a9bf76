from .losses import (
    MultitaskLoss,
    camera_pose_loss,
    compute_warmup_weight,
    depth_loss,
    per_chunk_regularization_loss,
    per_frame_regularization_loss,
    relative_pose_loss,
)
from .optim import (
    build_optimizer,
    freeze_mask,
    merge_params,
    partition_params,
    warmup_cosine_schedule,
)
from .train_step import TrainState, make_eval_step, make_train_step, merge_outputs_traced

__all__ = [
    "MultitaskLoss", "camera_pose_loss", "compute_warmup_weight",
    "depth_loss", "per_chunk_regularization_loss",
    "per_frame_regularization_loss", "relative_pose_loss",
    "build_optimizer", "freeze_mask", "merge_params", "partition_params",
    "warmup_cosine_schedule", "TrainState", "make_eval_step",
    "make_train_step", "merge_outputs_traced",
]

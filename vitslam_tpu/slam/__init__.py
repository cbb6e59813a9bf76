from .state import FeatureAlignContext, PointAlignContext, PoseAlignContext
from .chunking import (
    chunk_batch,
    check_and_fix_inf_nan,
    generate_chunks,
    merge_chunk_outputs,
    normalize_extrinsics_and_points,
)
from .gt_alignment import align_outputs, per_chunk_scale_from_poses
from .pipeline import ChunkedPipeline

__all__ = [
    "FeatureAlignContext", "PointAlignContext", "PoseAlignContext",
    "chunk_batch", "check_and_fix_inf_nan", "generate_chunks",
    "merge_chunk_outputs", "normalize_extrinsics_and_points",
    "align_outputs", "per_chunk_scale_from_poses", "ChunkedPipeline",
]

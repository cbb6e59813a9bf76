from .aggregator import Aggregator, PatchEmbedViT, expand_frame_tokens
from .camera_head import CameraHead
from .dpt_head import DPTHead
from .track_head import TrackHead
from .alignment_head import AlignmentHead
from .vggt_core import VGGTCore
from .feature_aligned import FeatureAlignedVGGT
from .point_aligned import PointAlignedVGGT
from .pose_aligned import PoseAlignedVGGT

__all__ = [
    "Aggregator", "PatchEmbedViT", "expand_frame_tokens",
    "CameraHead", "DPTHead", "TrackHead", "AlignmentHead",
    "VGGTCore", "FeatureAlignedVGGT", "PointAlignedVGGT", "PoseAlignedVGGT",
]

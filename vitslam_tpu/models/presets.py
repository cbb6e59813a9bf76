"""Model presets.

``flagship()`` mirrors the reference's shipped configuration: VGGT-1B-scale
backbone (DINOv2-L patch embed: 24 blocks @ 1024; 24 alternating frame/
global attention pairs @ 1024; taps [4, 11, 17, 23]) + AlignmentHead with 8
memory tokens and temporal attention, camera/depth/point heads enabled,
track head off (reference: every config sets enable_track False —
SURVEY.md §2.9a).
"""
from __future__ import annotations

import jax.numpy as jnp

from .feature_aligned import FeatureAlignedVGGT
from .point_aligned import PointAlignedVGGT
from .pose_aligned import PoseAlignedVGGT

FLAGSHIP = dict(
    img_size=518, patch_size=14, embed_dim=1024, depth=24, num_heads=16,
    patch_embed_depth=24, intermediate_layers=(4, 11, 17, 23),
    enable_camera=True, enable_depth=True, enable_point=True,
    enable_track=False, dtype=jnp.bfloat16,
)

SMALL = dict(
    img_size=224, patch_size=14, embed_dim=384, depth=6, num_heads=6,
    patch_embed_depth=4, intermediate_layers=(1, 2, 4, 5),
    enable_camera=True, enable_depth=True, enable_point=True,
    enable_track=False, dtype=jnp.bfloat16,
)


def flagship(**overrides) -> FeatureAlignedVGGT:
    kw = dict(FLAGSHIP)
    kw.update(_token_merge_overrides())
    kw.update(overrides)
    return FeatureAlignedVGGT(
        num_memory_tokens=kw.pop("num_memory_tokens", 8),
        temporal_attention=kw.pop("temporal_attention", True),
        **kw,
    )


def small_feature_aligned(**overrides) -> FeatureAlignedVGGT:
    kw = dict(SMALL)
    kw.update(overrides)
    return FeatureAlignedVGGT(
        num_memory_tokens=kw.pop("num_memory_tokens", 8),
        temporal_attention=kw.pop("temporal_attention", True),
        **kw,
    )


def _token_merge_overrides() -> dict:
    """Opt-in KV-compressed global attention for the large-chunk variants:
    VITSLAM_TOKEN_MERGE="<pool>,<anchor_stride>" (e.g. "2,5"). Off by
    default — it is an approximation (see models/aggregator.py)."""
    import os

    env = os.environ.get("VITSLAM_TOKEN_MERGE", "")
    if not env:
        return {}
    pool, stride = (env.split(",") + ["1"])[:2]
    return dict(global_merge_pool=int(pool), global_merge_stride=int(stride))


def flagship_point_aligned(**overrides) -> PointAlignedVGGT:
    # production setting is chunk width 75 (reference README.md:130 /
    # test_pointAlignedWrappedVGGT_vkitti.yaml): decode the DPT heads <=15
    # frames at a time so full-res conv intermediates fit HBM
    kw = dict(FLAGSHIP)
    kw.update(dict(enable_depth=False, dpt_frames_chunk=16))
    kw.update(_token_merge_overrides())
    kw.update(overrides)
    return PointAlignedVGGT(**kw)


def flagship_pose_aligned(**overrides) -> PoseAlignedVGGT:
    kw = dict(FLAGSHIP)
    kw.update(dict(enable_point=False, dpt_frames_chunk=16))
    kw.update(_token_merge_overrides())
    kw.update(overrides)
    return PoseAlignedVGGT(**kw)


def flagship_pose_only(**overrides) -> PoseAlignedVGGT:
    """Trajectory-only serving preset (a TPU-native extension beyond the
    reference's configs): camera head only — no DPT decode at all — for
    odometry/localisation serving where depth maps and point clouds are
    not needed. The chunk-and-align math is identical to the pose-aligned
    variant (aligned_vggt/models/poseAligned_wrapped_vggt.py:36-204); the
    decoder work drops to the 4-layer camera head, so throughput is set
    almost entirely by the backbone encode."""
    kw = dict(FLAGSHIP)
    kw.update(dict(enable_depth=False, enable_point=False))
    kw.update(_token_merge_overrides())
    kw.update(overrides)
    return PoseAlignedVGGT(**kw)

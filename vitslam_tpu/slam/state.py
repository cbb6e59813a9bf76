"""Chunk-to-chunk context state.

The reference threads a growing Python dict of per-chunk output lists
through the chunk loop (``context`` at
aligned_vggt/models/featureAligned_vggt.py:148-223,
training/run_model.py:330-335), holding every past chunk's outputs on
device. TPU-first redesign: the recurrent state is a **fixed-shape pytree**
holding only what the next chunk actually consumes — the processed overlap
tokens, the rolling memory tokens, and the tail of the previous chunk's
aligned outputs. Per-chunk outputs are returned to the driver, which
offloads them to host immediately (the analog of the reference's
moveDictListItemToCPU, training/training_metrics.py:650), so HBM stays flat
over arbitrarily long sequences and each chunk step jits once.
"""
from __future__ import annotations

from typing import Optional

import flax.struct
import jax


@flax.struct.dataclass
class FeatureAlignContext:
    """State consumed by FeatureAlignedVGGT for chunks after the first.

    Attributes:
        overlap_tokens: (B, 1+overlap, 1+P, C_embed) processed tokens from
            the previous chunk (first-frame column + overlap frames).
        memory_tokens: (B, M, dec_dim) unit-norm rolling memory, or None
            when the memory mechanism is disabled.
        prev_pose_enc: (B, overlap, 9) previous chunk's aligned pose
            encodings for its last ``overlap`` frames (global frame).
    """
    overlap_tokens: jax.Array
    memory_tokens: Optional[jax.Array]
    prev_pose_enc: jax.Array


@flax.struct.dataclass
class PointAlignContext:
    """State consumed by the point-aligned VGGT variant.

    Attributes:
        prev_points: (B, overlap, H, W, 3) previous chunk's *aligned* world
            points for its last ``overlap`` frames.
        prev_conf: (B, overlap, H, W) matching confidences.
    """
    prev_points: jax.Array
    prev_conf: jax.Array


@flax.struct.dataclass
class PoseAlignContext:
    """State consumed by the pose-aligned VGGT variant.

    Attributes:
        prev_pose_enc: (B, overlap, 9) previous chunk's aligned pose
            encodings for its last ``overlap`` frames.
    """
    prev_pose_enc: jax.Array

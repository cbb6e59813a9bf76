"""FeatureAlignedVGGT — the flagship model: VGGT backbone + trained
AlignmentHead fusing chunks through feature-level Sim(3)/SE(3) regression.

Behavior parity with aligned_vggt/models/featureAligned_vggt.py:16-254:
  * aggregator over the chunk, taps [4, 11, 17, 23];
  * AlignmentHead on the last tap -> chunk Sim(3) enc (B,1,8), per-frame
    SE(3) encs (B,S-1,7), next overlap tokens, updated memory tokens;
  * per-frame SE3 = [chunk_se3 ; frame_se3 @ chunk_se3] (:97-101);
  * CameraHead decode; first pose forced to identity via closed-form SE(3)
    inverse; predicted chunk scale applied to translations (:110-119);
  * inter-chunk initial transform = average of inv(cur_overlap) @
    prev_overlap (quaternion-averaged when overlap > 1) or the GT first
    pose in chunk_gt mode (:122-137);
  * aligned_extr = extr @ per_frame_se3 @ mean_transform (:139-143);
  * depth x chunk_scale; point maps scaled + re-expressed in the previous
    chunk's frame (:166-207).

TPU-first: the whole per-chunk step is one jit-able function of
(images, context_state) -> (chunk outputs, new state) with static shapes;
pose/geometry math is fp32 (the reference's autocast-off island :104);
no list accumulation inside the model — the driver owns sequence assembly.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry import (
    average_pose_encodings,
    closed_form_inverse_se3,
    extri_intri_to_pose_encoding,
    extri_to_pose_encoding,
    pad_to_4x4,
    pose_encoding_to_extri,
    pose_encoding_to_extri_intri,
)
from ..slam.state import FeatureAlignContext
from .alignment_head import AlignmentHead
from .vggt_core import VGGTCore


class FeatureAlignedVGGT(nn.Module):
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_embed_depth: int = 24
    intermediate_layers: tuple = (4, 11, 17, 23)
    enable_camera: bool = True
    enable_depth: bool = True
    enable_point: bool = True
    enable_track: bool = False
    dpt_frames_chunk: int = 0
    num_memory_tokens: int = 8
    temporal_attention: bool = True
    align_embed_dim: int = 1024
    align_dec_dim: int = 512
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    # KV-compressed global attention (opt-in approximation; parameter-free,
    # so checkpoints trained exact load unchanged — see models/aggregator.py)
    global_merge_pool: int = 0
    global_merge_stride: int = 1

    @property
    def enable_memory(self) -> bool:
        return self.num_memory_tokens > 0

    def setup(self):
        self.core = VGGTCore(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads,
            patch_embed_depth=self.patch_embed_depth,
            intermediate_layers=tuple(self.intermediate_layers),
            enable_camera=self.enable_camera, enable_depth=self.enable_depth,
            enable_point=self.enable_point, enable_track=self.enable_track,
            dpt_frames_chunk=self.dpt_frames_chunk,
            dtype=self.dtype, remat=self.remat,
            global_merge_pool=self.global_merge_pool,
            global_merge_stride=self.global_merge_stride,
        )
        self.alignment_head = AlignmentHead(
            patch_size=self.patch_size, in_dim=2 * self.embed_dim,
            embed_dim=self.align_embed_dim, dec_dim=self.align_dec_dim,
            num_memory_tokens=self.num_memory_tokens,
            temporal_attention=self.temporal_attention, dtype=self.dtype,
        )

    def embed_frames(self, images: jax.Array):
        """Per-frame patch embedding (frame-independent; see
        VGGTCore.embed_frames — used by the pipeline's unique-frame
        dedup)."""
        return self.core.embed_frames(images)

    def encode_chunks(self, images: jax.Array,
                      patch_tokens=None) -> dict:
        """The chunk-independent (and therefore **batchable**) stage: run
        the frozen backbone and all decoder heads, returning raw per-chunk
        outputs plus the last tap for the alignment stage.

        TPU-first restructure: the reference runs the whole model strictly
        sequentially per chunk (featureAligned_vggt.py:48-223), but only the
        AlignmentHead's temporal attention + the inter-chunk pose
        composition actually depend on the previous chunk. Everything here
        can be batched over several chunks at once (stack chunks along B),
        which is where ~95% of the FLOPs live. Numerics are identical.
        """
        B, S, _, H, W = images.shape
        taps, psi = self.core.encode(images, patch_tokens)
        raw: dict = {"last_tap": taps[-1]}
        if self.enable_camera:
            raw["pose_enc_raw"] = self.core.decode_camera(taps)[-1]
        if self.enable_depth:
            raw["depth_raw"], raw["depth_conf"] = self.core.decode_depth(
                taps, images, psi
            )
        if self.enable_point:
            raw["points_raw"], raw["points_conf"] = self.core.decode_point(
                taps, images, psi
            )
        return raw

    def __call__(
        self,
        images: jax.Array,
        num_overlap: int,
        context: Optional[FeatureAlignContext] = None,
        gt_poses: Optional[jax.Array] = None,
        train: bool = False,
    ):
        """One chunk step.

        Args:
            images: (B, S, 3, H, W) in [0, 1].
            num_overlap: overlap with the next/previous chunk (static).
            context: state from the previous chunk, or None (first chunk).
            gt_poses: (B, S, 3, 4|4, 4) chunk GT w2c for chunk_gt mode; the
                first pose is used as the inter-chunk transform.
            train: enables AlignmentHead frame dropout ('dropout' rng).
        Returns:
            (outputs dict, FeatureAlignContext) — outputs:
              pose_enc (B,S,9), depth (B,S,H,W,1), depth_conf (B,S,H,W),
              world_points (B,S,H,W,3), world_points_conf (B,S,H,W),
              chunk_sim3_enc (B,1,8), frame_se3_enc (B,S-1,7).
        """
        raw = self.encode_chunks(images)
        return self.align_chunk(
            raw, images.shape, num_overlap, context, gt_poses, train
        )

    def align_chunk(
        self,
        raw: dict,
        images_shape,
        num_overlap: int,
        context: Optional[FeatureAlignContext] = None,
        gt_poses: Optional[jax.Array] = None,
        train: bool = False,
    ):
        """The sequential stage: AlignmentHead + fp32 pose/scale composition
        over precomputed raw outputs from :meth:`encode_chunks`."""
        B, S, _, H, W = images_shape

        # a remainder chunk can be narrower than the configured overlap
        overlap = num_overlap if S > num_overlap else S - 1

        ctx_tokens = context.overlap_tokens if context is not None else None
        ctx_memory = (
            context.memory_tokens
            if (context is not None and self.enable_memory) else None
        )
        chunk_sim3_enc, frame_se3_enc, memory_tokens, overlap_tokens = (
            self.alignment_head(
                raw["last_tap"], (H, W), overlap, ctx_tokens, ctx_memory, train
            )
        )

        chunk_se3 = pose_encoding_to_extri(chunk_sim3_enc)      # (B,1,4,4)
        chunk_scale = chunk_sim3_enc[..., -1]                   # (B,1)
        frame_se3 = pose_encoding_to_extri(frame_se3_enc)       # (B,S-1,4,4)
        per_frame_se3 = jnp.concatenate(
            [chunk_se3, frame_se3 @ chunk_se3], axis=1
        )                                                       # (B,S,4,4)

        outputs: dict = {
            "chunk_sim3_enc": chunk_sim3_enc,
            "frame_se3_enc": frame_se3_enc,
        }
        if self.enable_memory:
            # exposed for the memory-token cosine-similarity diagnostics
            # (reference training_metrics.py:505-524)
            outputs["memory_tokens"] = memory_tokens
        point_ident = None
        if self.enable_camera:
            extr, intr = pose_encoding_to_extri_intri(raw["pose_enc_raw"], (H, W))
            extr = pad_to_4x4(extr)
            ident_align = closed_form_inverse_se3(extr[:, 0])   # (B,4,4)
            point_ident = jax.lax.stop_gradient(extr[:, 0])
            extr = extr @ ident_align[:, None]
            extr = extr.at[:, :, :3, 3].multiply(chunk_scale[:, :, None])

            if context is not None:
                if gt_poses is not None:
                    mean_transform = pad_to_4x4(
                        gt_poses.astype(jnp.float32)
                    )[:, :1]                                    # (B,1,4,4)
                else:
                    prev = pose_encoding_to_extri(
                        context.prev_pose_enc[:, -overlap:]
                    )                                           # (B,ovl,4,4)
                    inv_cur = closed_form_inverse_se3(extr[:, :overlap])
                    cam_t = inv_cur @ prev
                    if overlap > 1:
                        mean_transform = pose_encoding_to_extri(
                            average_pose_encodings(extri_to_pose_encoding(cam_t))
                        )
                    else:
                        mean_transform = cam_t
            else:
                mean_transform = jnp.broadcast_to(
                    jnp.eye(4, dtype=jnp.float32)[None, None], (B, 1, 4, 4)
                )
            per_frame_se3 = per_frame_se3 @ mean_transform
            aligned_extr = extr @ per_frame_se3
            outputs["pose_enc"] = extri_intri_to_pose_encoding(
                aligned_extr[..., :3, :4], intr, (H, W)
            )

        if self.enable_depth:
            outputs["depth"] = (
                raw["depth_raw"] * chunk_scale[:, :, None, None, None]
            )
            outputs["depth_conf"] = raw["depth_conf"]

        if self.enable_point:
            pts3d = raw["points_raw"]
            pts_conf = raw["points_conf"]
            if self.enable_camera:
                if context is not None:
                    point_t = (
                        closed_form_inverse_se3(per_frame_se3[:, 0])
                        @ point_ident
                    )                                           # (B,4,4)
                else:
                    point_t = point_ident
                pts3d = pts3d * chunk_scale[:, :, None, None, None]
                R = point_t[:, :3, :3]
                t = point_t[:, :3, 3]
                pts3d = (
                    jnp.einsum("bij,bshwj->bshwi", R, pts3d)
                    + t[:, None, None, None, :]
                )
            outputs["world_points"] = pts3d
            outputs["world_points_conf"] = pts_conf

        new_state = FeatureAlignContext(
            overlap_tokens=overlap_tokens,
            memory_tokens=memory_tokens if self.enable_memory else None,
            prev_pose_enc=(
                outputs["pose_enc"][:, -num_overlap:]
                if self.enable_camera
                else jnp.zeros((B, num_overlap, 9), jnp.float32)
            ),
        )
        return outputs, new_state

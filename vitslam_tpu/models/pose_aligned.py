"""PoseAlignedVGGT — training-free baseline: chunks fused by relative-pose
averaging over the overlapping camera poses.

Behavior parity with aligned_vggt/models/poseAligned_wrapped_vggt.py:36-204:
  * CameraHead decode; first pose forced to identity;
  * optional GT scale via LSE on first-frame-centered positions when GT
    poses are supplied (:84-104);
  * inter-chunk SE(3) = mean over the overlap of inv(cur) @ prev, with
    Markley quaternion averaging when overlap > 1 (:111-124);
  * aligned_extr = extr @ mean_transform; point maps re-expressed via
    inv(mean_transform) @ original-first-pose (:171-187).
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
from ..slam.state import PoseAlignContext
from .vggt_core import VGGTCore


def _batched_scale_lse(x: jax.Array, y: jax.Array) -> jax.Array:
    """|sum(x*y)/sum(x^2)| per batch element over all trailing dims."""
    num = jnp.sum(x * y, axis=tuple(range(1, x.ndim)))
    den = jnp.sum(x * x, axis=tuple(range(1, x.ndim))).clip(1e-12)
    return jnp.abs(num / den)


class PoseAlignedVGGT(nn.Module):
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_embed_depth: int = 24
    intermediate_layers: tuple = (4, 11, 17, 23)
    enable_camera: bool = True
    enable_depth: bool = True
    enable_point: bool = False
    enable_track: bool = False
    dpt_frames_chunk: int = 0
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    seq_axis: str | None = None  # sequence-parallel encode (VGGTCore)
    global_merge_pool: int = 0   # KV-compressed global attention (opt-in)
    global_merge_stride: int = 1

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
            dtype=self.dtype, remat=self.remat, seq_axis=self.seq_axis,
            global_merge_pool=self.global_merge_pool,
            global_merge_stride=self.global_merge_stride,
        )

    def embed_frames(self, images: jax.Array):
        """Per-frame patch embedding (frame-independent; see
        VGGTCore.embed_frames — used by the pipeline's unique-frame
        dedup)."""
        return self.core.embed_frames(images)

    def encode_chunks(self, images: jax.Array,
                      patch_tokens=None) -> dict:
        """Chunk-independent (batchable) stage: backbone + decoder heads."""
        taps, psi = self.core.encode(images, patch_tokens)
        raw: dict = {"pose_enc_raw": self.core.decode_camera(taps)[-1]}
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
        context: Optional[PoseAlignContext] = None,
        gt_poses: Optional[jax.Array] = None,
        train: bool = False,
    ):
        """gt_poses: (B, S, 3, 4) or (B, S, 4, 4) chunk GT w2c for GT-scale
        alignment and chunk_gt mode, or None."""
        assert self.enable_camera, "pose-aligned variant needs the camera head"
        raw = self.encode_chunks(images)
        return self.align_chunk(raw, images.shape, num_overlap, context,
                                gt_poses, train)

    def align_chunk(
        self,
        raw: dict,
        images_shape,
        num_overlap: int,
        context: Optional[PoseAlignContext] = None,
        gt_poses: Optional[jax.Array] = None,
        train: bool = False,
    ):
        B, S, _, H, W = images_shape
        outputs: dict = {}
        extr, intr = pose_encoding_to_extri_intri(raw["pose_enc_raw"], (H, W))
        extr = pad_to_4x4(extr)
        ident_align = closed_form_inverse_se3(extr[:, 0])
        point_ident = jax.lax.stop_gradient(extr[:, 0])
        extr = extr @ ident_align[:, None]

        scales = jnp.ones((B,), jnp.float32)
        if gt_poses is not None and S > 1:
            gt = pad_to_4x4(gt_poses.astype(jnp.float32))
            centering = closed_form_inverse_se3(gt[:, 0])
            gt_centered = gt @ centering[:, None]
            scales = _batched_scale_lse(
                extr[..., :3, 3], gt_centered[..., :3, 3]
            )
            extr = extr.at[..., :3, 3].multiply(scales[:, None, None])

        if context is not None:
            if gt_poses is not None:
                mean_transform = pad_to_4x4(gt_poses.astype(jnp.float32))[:, :1]
            else:
                prev = pose_encoding_to_extri(
                    context.prev_pose_enc[:, -num_overlap:]
                )
                inv_cur = closed_form_inverse_se3(extr[:, :num_overlap])
                cam_t = inv_cur @ prev
                if num_overlap > 1:
                    mean_transform = pose_encoding_to_extri(
                        average_pose_encodings(extri_to_pose_encoding(cam_t))
                    )
                else:
                    mean_transform = cam_t
        else:
            mean_transform = jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32)[None, None], (B, 1, 4, 4)
            )

        aligned_extr = extr @ mean_transform
        outputs["pose_enc"] = extri_intri_to_pose_encoding(
            aligned_extr[..., :3, :4], intr, (H, W)
        )

        if self.enable_depth:
            outputs["depth"] = (
                raw["depth_raw"] * scales[:, None, None, None, None]
            )
            outputs["depth_conf"] = raw["depth_conf"]

        if self.enable_point:
            pts3d = raw["points_raw"] * scales[:, None, None, None, None]
            pts_conf = raw["points_conf"]
            if context is not None:
                point_t = (
                    closed_form_inverse_se3(mean_transform[:, 0]) @ point_ident
                )
            else:
                point_t = point_ident
            R, t = point_t[:, :3, :3], point_t[:, :3, 3]
            pts3d = (
                jnp.einsum("bij,bshwj->bshwi", R, pts3d)
                + t[:, None, None, None, :]
            )
            outputs["world_points"] = pts3d
            outputs["world_points_conf"] = pts_conf

        new_state = PoseAlignContext(
            prev_pose_enc=outputs["pose_enc"][:, -num_overlap:]
        )
        return outputs, new_state

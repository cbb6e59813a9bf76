"""PointAlignedVGGT — training-free baseline: chunks fused by robust
IRLS-Umeyama Sim(3) over overlapping point maps.

Behavior parity with aligned_vggt/models/pointAligned_wrapped_vggt.py:14-157:
the current chunk's first ``overlap`` point maps are aligned onto the
previous chunk's (already global-frame) last ``overlap`` aligned point maps
via irls_sim3_umeyama (confidence combine sqrt(c1*c2), adaptive median
threshold, Huber delta 0.1, <=20 iters); the resulting Sim(3) is applied to
the chunk's point maps, w2c poses, and depth (scale only).

TPU-first: the IRLS solver is batched via vmap (the reference loops over B
with dynamic boolean masking; here below-threshold points get weight zero
so shapes stay static and the whole step jits).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry import (
    apply_sim3_on_point_maps,
    apply_sim3_on_w2c,
    extri_intri_to_pose_encoding,
    irls_sim3_umeyama,
    pose_encoding_to_extri_intri,
)
from ..slam.state import PointAlignContext
from .vggt_core import VGGTCore


def _batched_irls(src, dst, conf_src, conf_dst):
    """vmapped IRLS Sim(3): src/dst (B, N, H, W, 3), confs (B, N, H, W).
    Returns transforms (B, 4, 4) and scales (B,)."""

    def solve(s, d, cs, cd):
        R, t, scale = irls_sim3_umeyama(s, d, cs, cd)
        T = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(t)
        return T, scale

    return jax.vmap(solve)(src, dst, conf_src, conf_dst)


class PointAlignedVGGT(nn.Module):
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_embed_depth: int = 24
    intermediate_layers: tuple = (4, 11, 17, 23)
    enable_camera: bool = True
    enable_depth: bool = False
    enable_point: bool = True
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
        """Chunk-independent (batchable) stage: backbone + decoder heads
        (the IRLS alignment in align_chunk is the only sequential part)."""
        taps, psi = self.core.encode(images, patch_tokens)
        raw: dict = {}
        raw["points_raw"], raw["points_conf"] = self.core.decode_point(
            taps, images, psi
        )
        if self.enable_camera:
            raw["pose_enc_raw"] = self.core.decode_camera(taps)[-1]
        if self.enable_depth:
            raw["depth_raw"], raw["depth_conf"] = self.core.decode_depth(
                taps, images, psi
            )
        return raw

    def __call__(
        self,
        images: jax.Array,
        num_overlap: int,
        context: Optional[PointAlignContext] = None,
        gt_poses: Optional[jax.Array] = None,  # unused (parity: reference
        # pointAligned accepts gt_poses but never consumes it)
        train: bool = False,
    ):
        assert self.enable_point, "point-aligned variant needs the point head"
        raw = self.encode_chunks(images)
        return self.align_chunk(raw, images.shape, num_overlap, context,
                                gt_poses, train)

    def align_chunk(
        self,
        raw: dict,
        images_shape,
        num_overlap: int,
        context: Optional[PointAlignContext] = None,
        gt_poses: Optional[jax.Array] = None,
        train: bool = False,
    ):
        B, S, _, H, W = images_shape
        outputs: dict = {}
        pts3d, pts_conf = raw["points_raw"], raw["points_conf"]

        if context is not None:
            transform, scales = _batched_irls(
                pts3d[:, :num_overlap].astype(jnp.float32),
                context.prev_points.astype(jnp.float32),
                pts_conf[:, :num_overlap].astype(jnp.float32),
                context.prev_conf.astype(jnp.float32),
            )
        else:
            transform = jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32)[None], (B, 4, 4)
            )
            scales = jnp.ones((B,), jnp.float32)

        pts3d_final = apply_sim3_on_point_maps(pts3d, transform, scales)
        outputs["world_points"] = pts3d_final
        outputs["world_points_conf"] = pts_conf

        if self.enable_camera:
            extr, intr = pose_encoding_to_extri_intri(raw["pose_enc_raw"], (H, W))
            aligned_extr = apply_sim3_on_w2c(extr, transform, scales)
            outputs["pose_enc"] = extri_intri_to_pose_encoding(
                aligned_extr[..., :3, :4], intr, (H, W)
            )

        if self.enable_depth:
            outputs["depth"] = (
                raw["depth_raw"] * scales[:, None, None, None, None]
            )
            outputs["depth_conf"] = raw["depth_conf"]

        new_state = PointAlignContext(
            prev_points=pts3d_final[:, -num_overlap:],
            prev_conf=pts_conf[:, -num_overlap:],
        )
        return outputs, new_state

"""VGGTCore — the shared backbone + decoder-head stack used by all three
aligned model variants (feature / point / pose).

Mirrors the component set every reference variant instantiates
(aligned_vggt/models/featureAligned_vggt.py:25-31,
pointAligned_wrapped_vggt.py:21-27, poseAligned_wrapped_vggt.py): an
Aggregator plus optional CameraHead / DPTHead(depth) / DPTHead(point) /
TrackHead, with the DPT heads reading the tapped intermediate layers
[4, 11, 17, 23] and the camera head reading the last tap's camera token.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .aggregator import Aggregator
from .camera_head import CameraHead
from .dpt_head import DPTHead
from .track_head import TrackHead


class VGGTCore(nn.Module):
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_embed_depth: int = 24
    patch_embed_heads: int = 16
    intermediate_layers: Sequence[int] = (4, 11, 17, 23)
    enable_camera: bool = True
    enable_depth: bool = True
    enable_point: bool = True
    enable_track: bool = False
    dpt_features: int = 256
    dpt_out_channels: Sequence[int] = (256, 512, 1024, 1024)
    # decode DPT heads at most this many frames at a time (0 = all at once).
    # The reference's VGGT runs its DPT with frames_chunk_size=8 for the same
    # reason: at chunk width 75 the full-res conv intermediates for all
    # frames at once (e.g. (75, 518, 518, 128)) would blow HBM.
    dpt_frames_chunk: int = 0
    camera_trunk_depth: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    # sequence parallelism (SURVEY §5.7): when set, __call__/encode expect
    # to run inside shard_map with the frame axis S sharded over this named
    # mesh axis. Patch embed / frame attention / MLPs / DPT decode are
    # frame-local; global attention all-gathers prepped K/V per layer; the
    # camera head (which attends ACROSS frames) gathers its S camera tokens,
    # runs replicated, and returns the local frame slice.
    seq_axis: str | None = None
    # KV-compressed global attention (opt-in, see models/aggregator.py)
    global_merge_pool: int = 0
    global_merge_stride: int = 1

    def setup(self):
        self.aggregator = Aggregator(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads,
            patch_embed_depth=self.patch_embed_depth,
            patch_embed_heads=self.patch_embed_heads,
            intermediate_layers=tuple(self.intermediate_layers),
            dtype=self.dtype, remat=self.remat, seq_axis=self.seq_axis,
            merge_pool=self.global_merge_pool,
            merge_stride=self.global_merge_stride,
        )
        dim_in = 2 * self.embed_dim
        if self.enable_camera:
            self.camera_head = CameraHead(
                dim_in=dim_in, trunk_depth=self.camera_trunk_depth,
                num_heads=self.num_heads, dtype=self.dtype,
            )
        if self.enable_depth:
            self.depth_head = DPTHead(
                dim_in=dim_in, output_dim=2, activation="exp",
                conf_activation="expp1", features=self.dpt_features,
                out_channels=tuple(self.dpt_out_channels),
                patch_size=self.patch_size, dtype=self.dtype,
            )
        if self.enable_point:
            self.point_head = DPTHead(
                dim_in=dim_in, output_dim=4, activation="inv_log",
                conf_activation="expp1", features=self.dpt_features,
                out_channels=tuple(self.dpt_out_channels),
                patch_size=self.patch_size, dtype=self.dtype,
            )
        if self.enable_track:
            self.track_head = TrackHead(
                dim_in=dim_in, patch_size=self.patch_size, dtype=self.dtype,
            )

    def encode(self, images: jax.Array, patch_tokens=None):
        """images (B, S, 3, H, W) -> (taps list, patch_start_idx)."""
        return self.aggregator(images, patch_tokens)

    def embed_frames(self, images: jax.Array):
        """Per-frame patch embedding only: (B, S, 3, H, W) ->
        (B, S, P, embed_dim). Frame-independent, so the pipeline can embed
        each unique frame once per chunk group."""
        return self.aggregator(images, None, True)

    def decode_camera(self, taps) -> list[jax.Array]:
        """-> list over refinement iterations of (B, S, 9) fp32 encodings."""
        camera_tokens = taps[-1][:, :, 0, :]
        if self.seq_axis is not None:
            # the camera trunk attends across frames: gather all S camera
            # tokens (tiny: S x 2C), run the head replicated, hand back the
            # local frame slice so every output of the sharded encode stays
            # sharded on S
            S_local = camera_tokens.shape[1]
            camera_tokens = jax.lax.all_gather(
                camera_tokens, self.seq_axis, axis=1, tiled=True)
            idx = jax.lax.axis_index(self.seq_axis)
            encs = self.camera_head(camera_tokens)
            return [jax.lax.dynamic_slice_in_dim(e, idx * S_local, S_local,
                                                 axis=1) for e in encs]
        return self.camera_head(camera_tokens)

    def decode_depth(self, taps, images, patch_start_idx):
        return self._decode_dpt(self.depth_head, taps, images, patch_start_idx)

    def decode_point(self, taps, images, patch_start_idx):
        return self._decode_dpt(self.point_head, taps, images, patch_start_idx)

    def _decode_dpt(self, head, taps, images, patch_start_idx):
        """Run a DPT head over at most ``dpt_frames_chunk`` frames at a time
        (static Python unroll — each group's full-res intermediates die
        before the next group's are live)."""
        S = images.shape[1]
        fc = self.dpt_frames_chunk
        if not fc or S <= fc:
            return head(taps, images, patch_start_idx)
        fc = max(d for d in range(1, fc + 1) if S % d == 0)
        outs = []
        for s0 in range(0, S, fc):
            sl = slice(s0, s0 + fc)
            outs.append(head([t[:, sl] for t in taps], images[:, sl],
                             patch_start_idx))
        return (jnp.concatenate([o[0] for o in outs], axis=1),
                jnp.concatenate([o[1] for o in outs], axis=1))

    def decode_track(self, taps, images, patch_start_idx, query_points):
        return self.track_head(taps, images, patch_start_idx, query_points)

    def __call__(self, images: jax.Array):
        """Plain single-chunk forward (no inter-chunk alignment): returns the
        raw predictions dict. Useful for parity tests and the weight
        converter."""
        taps, psi = self.encode(images)
        out = {}
        if self.enable_camera:
            out["pose_enc_list"] = self.decode_camera(taps)
        if self.enable_depth:
            out["depth"], out["depth_conf"] = self.decode_depth(taps, images, psi)
        if self.enable_point:
            out["world_points"], out["world_points_conf"] = self.decode_point(
                taps, images, psi
            )
        return out

"""CameraHead — iterative camera pose regression from the camera token.

Behavior parity with VGGT's CameraHead (SURVEY.md §2.9a, import site
aligned_vggt/models/featureAligned_vggt.py:6,27): takes the last aggregator
layer's camera token (B, S, 2*embed_dim), runs ``num_iters`` refinement
iterations — each embeds the current 9-d absT_quaR_FoV pose encoding,
adaLN-modulates the trunk (self-attention across the S frames of the chunk),
and regresses a delta — and returns the list of per-iteration (B, S, 9)
encodings (callers use the last: featureAligned_vggt.py:109).

The iteration loop is a static Python loop of length ``num_iters`` (4):
XLA unrolls it into one fused graph; pose encodings are fp32.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import Block, Mlp


class CameraHead(nn.Module):
    dim_in: int = 2048
    trunk_depth: int = 4
    num_heads: int = 16
    mlp_ratio: float = 4.0
    pose_dim: int = 9
    num_iters: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, camera_tokens: jax.Array) -> list[jax.Array]:
        """camera_tokens (B, S, dim_in) -> list of num_iters (B, S, 9) fp32."""
        B, S, C = camera_tokens.shape
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="token_norm")(camera_tokens.astype(self.dtype))

        embed_pose = nn.Dense(self.dim_in, dtype=self.dtype,
                              param_dtype=jnp.float32, name="embed_pose")
        modulation = nn.Dense(3 * self.dim_in, dtype=self.dtype,
                              param_dtype=jnp.float32,
                              kernel_init=nn.initializers.zeros,
                              name="modulation")
        trunk = [
            Block(dim=self.dim_in, num_heads=self.num_heads,
                  mlp_ratio=self.mlp_ratio, qk_norm=True,
                  dtype=self.dtype, name=f"trunk_{i}")
            for i in range(self.trunk_depth)
        ]
        trunk_norm = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                  name="trunk_norm")
        adaln_norm = nn.LayerNorm(use_bias=False, use_scale=False,
                                  dtype=self.dtype, name="adaln_norm")
        pose_branch = Mlp(self.dim_in // 2, self.pose_dim,
                          dtype=jnp.float32, name="pose_branch")

        empty_pose = self.param("empty_pose_enc", nn.initializers.zeros,
                                (1, 1, self.pose_dim), jnp.float32)

        pred = jnp.broadcast_to(empty_pose, (B, S, self.pose_dim))
        preds: list[jax.Array] = []
        for _ in range(self.num_iters):
            cond = embed_pose(jax.lax.stop_gradient(pred).astype(self.dtype))
            shift, scale, gate = jnp.split(
                modulation(nn.silu(cond)), 3, axis=-1
            )
            h = adaln_norm(x) * (1.0 + scale) + shift
            for blk in trunk:
                h = blk(h)
            delta = pose_branch(trunk_norm(x + gate * h).astype(jnp.float32))
            pred = pred + delta
            preds.append(pred)
        return preds

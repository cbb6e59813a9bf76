"""CameraHead — iterative camera pose regression from the camera token.

Exact behavior parity with VGGT's CameraHead (SURVEY.md §2.9a, import site
aligned_vggt/models/featureAligned_vggt.py:6,27), so real VGGT-1B weights
load 1:1 and reproduce its outputs: the last aggregator layer's camera token
(B, S, 2*embed_dim) is LayerNormed (``token_norm``); each of ``num_iters``
(4) refinement iterations embeds the current 9-d absT_quaR_FoV encoding
(iteration 0 embeds the learned ``empty_pose_tokens``), produces adaLN
shift/scale/gate (``modulation`` = VGGT ``poseLN_modulation.1``), modulates
the tokens as ``gate * (adaln_norm(x) * (1 + scale) + shift) + x``, runs the
4-block self-attention trunk across the S frames (LayerScale init 0.01, no
qk-norm — VGGT camera-head Block defaults), and regresses a delta through
``pose_branch`` on ``trunk_norm``. Iteration 0's prediction is the bare
delta; later iterations accumulate on the detached previous encoding. Each
iteration's encoding gets the per-part activations (translation linear,
quaternion linear, FoV relu) before being appended.

The iteration loop is a static Python loop of length ``num_iters``: XLA
unrolls it into one fused graph; pose encodings are fp32.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import Block, Mlp


def activate_pose(enc: jax.Array, trans_act: str = "linear",
                  quat_act: str = "linear", fov_act: str = "relu") -> jax.Array:
    """Per-part activation of a 9-d absT_quaR_FoV encoding (VGGT
    activate_pose semantics; default linear/linear/relu)."""

    def act(x, kind):
        if kind == "linear":
            return x
        if kind == "relu":
            return jax.nn.relu(x)
        raise ValueError(f"unknown pose activation {kind!r}")

    return jnp.concatenate(
        [act(enc[..., :3], trans_act), act(enc[..., 3:7], quat_act),
         act(enc[..., 7:], fov_act)], axis=-1
    )


class CameraHead(nn.Module):
    dim_in: int = 2048
    trunk_depth: int = 4
    num_heads: int = 16
    mlp_ratio: float = 4.0
    pose_dim: int = 9
    num_iters: int = 4
    init_values: float = 0.01
    trans_act: str = "linear"
    quat_act: str = "linear"
    fov_act: str = "relu"
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
                              param_dtype=jnp.float32, name="modulation")
        trunk = [
            Block(dim=self.dim_in, num_heads=self.num_heads,
                  mlp_ratio=self.mlp_ratio, qk_norm=False,
                  init_values=self.init_values, dtype=self.dtype,
                  name=f"trunk_{i}")
            for i in range(self.trunk_depth)
        ]
        trunk_norm = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                  name="trunk_norm")
        adaln_norm = nn.LayerNorm(use_bias=False, use_scale=False,
                                  dtype=self.dtype, name="adaln_norm")
        pose_branch = Mlp(self.dim_in // 2, self.pose_dim,
                          dtype=jnp.float32, name="pose_branch")

        empty_pose = self.param("empty_pose_tokens", nn.initializers.zeros,
                                (1, 1, self.pose_dim), jnp.float32)

        pred: jax.Array | None = None
        preds: list[jax.Array] = []
        for _ in range(self.num_iters):
            if pred is None:
                cond_in = jnp.broadcast_to(empty_pose, (B, S, self.pose_dim))
            else:
                cond_in = jax.lax.stop_gradient(pred)
            cond = embed_pose(cond_in.astype(self.dtype))
            shift, scale, gate = jnp.split(modulation(nn.silu(cond)), 3, axis=-1)
            h = gate * (adaln_norm(x) * (1.0 + scale) + shift) + x
            for blk in trunk:
                h = blk(h)
            delta = pose_branch(trunk_norm(h).astype(jnp.float32))
            pred = delta if pred is None else pred + delta
            # the accumulator stays raw; only the emitted encoding is
            # activated (VGGT trunk_fn semantics)
            preds.append(activate_pose(pred, self.trans_act, self.quat_act,
                                       self.fov_act))
        return preds

"""GatedUpdate — the memory-token writer of the AlignmentHead.

Behavior parity with aligned_vggt/layers/gated_update.py:5-78:
  * N per-token delta MLPs (3D -> D -> D, GELU) over
    [update ‖ memory * ‖u‖ ‖ mean(memory) * ‖u‖];
  * one shared gate MLP (2D -> D -> 1) over the *gradient-detached*
    [delta - memory ‖ memory * ‖u‖], final bias initialized to
    logit(init_gate) and small (std 0.1) final weights;
  * the delta is orthogonalized against the (unit-norm) memory direction,
    normalized, gated, and the result re-normalized onto the unit sphere.

TPU-first: the N per-token MLPs are a single batched einsum over stacked
per-token weights (one MXU matmul of shape (N, 3D, D)) instead of a Python
loop of N small Linears.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


class GatedUpdate(nn.Module):
    token_dim: int
    num_tokens: int
    init_gate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, memory: jax.Array, update: jax.Array) -> jax.Array:
        """memory (B, N, D) unit-norm tokens; update (B, D) -> (B, N, D)."""
        B, N, D = memory.shape
        assert N == self.num_tokens and D == self.token_dim

        f32 = jnp.float32
        mem = memory.astype(f32)
        upd = update.astype(f32)

        u_scale = jnp.linalg.norm(upd, axis=-1, keepdims=True)[:, None]  # (B,1,1)
        upd_b = jnp.broadcast_to(upd[:, None], (B, N, D))
        mem_scaled = mem * u_scale
        mem_mean_scaled = jnp.broadcast_to(mem.mean(axis=1, keepdims=True), (B, N, D)) * u_scale

        delta_in = jnp.concatenate([upd_b, mem_scaled, mem_mean_scaled], axis=-1)  # (B,N,3D)

        # Per-token MLPs as stacked weights: one einsum per layer.
        lecun = nn.initializers.lecun_normal()
        w1 = self.param("delta_w1", lecun, (N, 3 * D, D), f32)
        b1 = self.param("delta_b1", nn.initializers.zeros, (N, D), f32)
        w2 = self.param("delta_w2", lecun, (N, D, D), f32)
        b2 = self.param("delta_b2", nn.initializers.zeros, (N, D), f32)
        h = jnp.einsum("bni,nio->bno", delta_in, w1) + b1
        h = nn.gelu(h, approximate=False)
        deltas = jnp.einsum("bni,nio->bno", h, w2) + b2  # (B, N, D)

        delta_diff = deltas - mem

        gate_in = jax.lax.stop_gradient(
            jnp.concatenate([delta_diff, mem_scaled], axis=-1)
        )
        g = nn.Dense(D, dtype=f32, param_dtype=f32, name="gate_fc1")(gate_in)
        g = nn.gelu(g, approximate=False)
        gate_logit = nn.Dense(
            1,
            dtype=f32,
            param_dtype=f32,
            kernel_init=nn.initializers.normal(stddev=0.1),
            bias_init=nn.initializers.constant(
                math.log(self.init_gate / (1.0 - self.init_gate))
            ),
            name="gate_fc2",
        )(g)
        gate = jax.nn.sigmoid(gate_logit)  # (B, N, 1)

        # Orthogonalize against the unit memory direction and normalize.
        proj = jnp.sum(delta_diff * mem, axis=-1, keepdims=True) * mem
        delta_orth = delta_diff - proj
        delta_dir = delta_orth / jnp.linalg.norm(delta_orth, axis=-1, keepdims=True).clip(1e-12)

        new_mem = mem + gate * delta_dir
        new_mem = new_mem / jnp.linalg.norm(new_mem, axis=-1, keepdims=True).clip(1e-12)
        return new_mem.astype(memory.dtype)

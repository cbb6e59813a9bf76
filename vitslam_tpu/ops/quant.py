"""int8 matmul path for the frozen backbone (opt-in "turbo" serving mode).

v5e's MXU runs int8 x int8 -> int32 at ~2x its bf16 rate. This module
implements symmetric dynamic quantization for the transformer's big
projections: activations are quantized per row (max-abs over the feature
axis), weights per output column, and the int32 product is rescaled in
fp32. The backbone is frozen in every reference config, so this is a pure
inference trade: outputs deviate at the ~1e-2 relative level (the
qk-normed attention and all geometry/decode stays bf16/fp32).

OPT-IN: VITSLAM_INT8=1 (env) routes Block matmuls here; the default path
and the shipped benchmarks remain bf16 parity. Both quantized operands are
materialized behind optimization barriers — otherwise XLA fuses the
round/scale prologues into the matmul's operand loops (the same ~3x
slowdown profiled for the gelu-in-fc2 fusion).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def int8_enabled() -> bool:
    return os.environ.get("VITSLAM_INT8", "0") == "1"


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., K) -> int8 values + per-row fp32 scale (max-abs symmetric)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    r = xf / scale
    # straight-through rounding: the backbone is frozen, but keep the trace
    # differentiable so jax.grad through an int8 model never hard-fails
    q = jnp.clip(r + jax.lax.stop_gradient(jnp.round(r) - r), -127, 127)
    q = q.astype(jnp.int8)
    return jax.lax.optimization_barrier(q), scale


def quantize_cols(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(K, N) weight -> int8 + per-column fp32 scale."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return jax.lax.optimization_barrier(q), scale


def int8_matmul(x: jax.Array, w: jax.Array, bias=None,
                out_dtype=jnp.bfloat16) -> jax.Array:
    """x (..., K) @ w (K, N) via the int8 MXU with dynamic rescale."""
    xq, xs = quantize_rows(x)
    wq, ws = quantize_cols(w)
    yq = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = yq.astype(jnp.float32) * xs * ws
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)

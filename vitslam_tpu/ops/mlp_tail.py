"""Fused MLP tail: fc2 matmul + bias + residual add + LayerNorm epilogue.

Round-2 profiling (BENCH.md "Profiled breakdown") pinned the square-518²
gap on XLA's fc2+residual+next-LN *output fusions* running at ~82 TF/s
while qkv/fc1 run at ~180 — the epilogue (row mean/var + normalize) rides
the matmul's output loop and halves its MXU utilization. This kernel keeps
the (block_m, C) f32 accumulator in VMEM across the K stream and runs the
whole epilogue once per block on the finalize step, emitting BOTH tensors
the transformer needs: the un-normalized residual stream x' = res + h@W2
+ b2 (next layer's residual input) and y = LN(x'; gamma, beta) (next
layer's attention input).

Reference behavior being replaced: nn/layers.py Block's
``x = x + Mlp(...)`` followed by the next Block's norm1
(reference parity: vggt Block/Mlp; aligned_vggt/models/blocks.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _mlp_tail_kernel(h_ref, w2_ref, b2_ref, res_ref, gamma_ref, beta_ref,
                     x_ref, y_ref, acc, *, eps: float, gelu: bool):
    kb = pl.program_id(1)
    nkb = pl.num_programs(1)

    @pl.when(kb == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    h = h_ref[...]
    if gelu:
        # exact (erf) gelu on the fc1 tile, fused into the matmul stream —
        # replaces the XLA-level optimization_barrier materialization
        # (nn/layers.py Mlp) AND the HBM round trip of the 4C-wide
        # activation
        hf = h.astype(jnp.float32)
        h = (hf * 0.5 * (1.0 + jax.lax.erf(hf * (1.0 / 2.0 ** 0.5)))
             ).astype(h.dtype)
    acc[...] += jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == nkb - 1)
    def _finalize():
        x = acc[...] + b2_ref[...] + res_ref[...].astype(jnp.float32)
        x_ref[...] = x.astype(x_ref.dtype)
        c = x.shape[1]
        mu = jnp.sum(x, axis=1, keepdims=True) * (1.0 / c)
        xc = x - mu
        var = jnp.sum(xc * xc, axis=1, keepdims=True) * (1.0 / c)
        y = xc * jax.lax.rsqrt(var + eps) * gamma_ref[...] + beta_ref[...]
        y_ref[...] = y.astype(y_ref.dtype)


def mlp_tail(h: jax.Array, w2: jax.Array, b2: jax.Array, res: jax.Array,
             gamma: jax.Array, beta: jax.Array, *, eps: float = 1e-6,
             gelu: bool = False, block_m: int = 1024, block_k: int = 1024):
    """(M, F) @ (F, C) + b2 + res, then LayerNorm -> (x', y), both (M, C).

    h is the gelu output (bf16), res the residual stream. Stats are fp32
    over the full C row (C must fit one lane block set, i.e. C <= ~4096).
    """
    M, F = h.shape
    C = w2.shape[1]
    block_m = min(block_m, _round_up(M, 128))
    block_k = min(block_k, F)
    m_pad = _round_up(M, block_m)
    if m_pad != M:
        h = jnp.pad(h, ((0, m_pad - M), (0, 0)))
        res = jnp.pad(res, ((0, m_pad - M), (0, 0)))
    grid = (m_pad // block_m, F // block_k)
    x, y = pl.pallas_call(
        functools.partial(_mlp_tail_kernel, eps=eps, gelu=gelu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, k: (i, k)),
            pl.BlockSpec((block_k, C), lambda i, k: (k, 0)),
            pl.BlockSpec((1, C), lambda i, k: (0, 0)),
            pl.BlockSpec((block_m, C), lambda i, k: (i, 0)),
            pl.BlockSpec((1, C), lambda i, k: (0, 0)),
            pl.BlockSpec((1, C), lambda i, k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_m, C), lambda i, k: (i, 0)),
            pl.BlockSpec((block_m, C), lambda i, k: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, C), h.dtype),
            jax.ShapeDtypeStruct((m_pad, C), h.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_m, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(h, w2, b2.reshape(1, C).astype(jnp.float32), res,
      gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32))
    return x[:M], y[:M]


def mlp_tail_reference(h, w2, b2, res, gamma, beta, eps: float = 1e-6,
                       gelu: bool = False):
    """Plain-XLA math of mlp_tail (CPU fallback / probe baseline)."""
    if gelu:
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
    x = (jnp.dot(h, w2, preferred_element_type=jnp.float32)
         + b2.astype(jnp.float32) + res.astype(jnp.float32))
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * gamma + beta
    return x.astype(h.dtype), y.astype(h.dtype)

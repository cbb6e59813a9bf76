"""Fused dense tail: matmul + bias + residual add (+ LayerNorm) epilogue.

Round-2 profiling (BENCH.md "Profiled breakdown") pinned the square-518²
gap on XLA's fc2+residual+next-LN *output fusions* running at ~82 TF/s
while qkv/fc1 run at ~180 — the epilogue (row mean/var + normalize) rides
the matmul's output loop and halves its MXU utilization. This kernel keeps
the (block_m, C) f32 accumulator in VMEM across the K stream and runs the
whole epilogue once per block on the finalize step.

Two modes:
  * ``ln=True``  — emits BOTH tensors the transformer needs: the
    un-normalized residual stream x' = res + h@W2 + b2 (next residual
    input) and y = LN(x'; gamma, beta) (the next attention/MLP input).
    Used for the proj+LayerScale+residual+norm2 tail inside a Block.
  * ``ln=False`` — emits only x'. Used for the fc2 tail, whose following
    LayerNorm (the NEXT block's norm1) lives across the layer-scan
    boundary and stays a standalone XLA op.

With ``gelu=True`` the exact (erf) gelu is applied to the streamed h tiles
in-kernel — replacing the XLA-level optimization_barrier materialization
(nn/layers.py Mlp) and the HBM round trip of the 4C-wide activation.

Reference behavior being replaced: nn/layers.py Block's
``x = x + LayerScale(Mlp(...))`` / ``x = x + LayerScale(proj(attn))``
followed by the next LayerNorm (reference parity: vggt Block/Attention/
Mlp; aligned_vggt/models/blocks.py). LayerScale is folded into W2/b2 by
the caller (a per-column scale commutes with the matmul).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 — far
    below bf16 output rounding): the Pallas TPU lowering has no erf
    primitive, so the in-kernel exact gelu uses this instead."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-a * a))


def _mlp_tail_kernel(h_ref, w2_ref, b2_ref, res_ref, *rest,
                     eps: float, gelu: bool, ln: bool):
    if ln:
        gamma_ref, beta_ref, x_ref, y_ref, acc = rest
    else:
        x_ref, acc = rest
    kb = pl.program_id(1)
    nkb = pl.num_programs(1)

    @pl.when(kb == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    h = h_ref[...]
    if gelu:
        # exact gelu on the fc1 tile, fused into the matmul stream
        hf = h.astype(jnp.float32)
        h = (hf * 0.5 * (1.0 + _erf_approx(hf * (1.0 / 2.0 ** 0.5)))
             ).astype(h.dtype)
    acc[...] += jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == nkb - 1)
    def _finalize():
        x = acc[...] + b2_ref[...] + res_ref[...].astype(jnp.float32)
        x_ref[...] = x.astype(x_ref.dtype)
        if ln:
            c = x.shape[1]
            mu = jnp.sum(x, axis=1, keepdims=True) * (1.0 / c)
            xc = x - mu
            var = jnp.sum(xc * xc, axis=1, keepdims=True) * (1.0 / c)
            y = xc * jax.lax.rsqrt(var + eps) * gamma_ref[...] + beta_ref[...]
            y_ref[...] = y.astype(y_ref.dtype)


def mlp_tail(h: jax.Array, w2: jax.Array, b2: jax.Array, res: jax.Array,
             gamma: jax.Array | None = None, beta: jax.Array | None = None,
             *, eps: float = 1e-6, gelu: bool = False, ln: bool = True,
             block_m: int = 256, block_k: int = 1024):
    """(M, F) @ (F, C) + b2 + res [, then LayerNorm].

    Returns (x', y) with ln=True, else x' alone — both (M, C). h is the
    raw fc1 output when gelu=True (gelu applied in-kernel). Stats are fp32
    over the full C row (C must fit one lane block set, i.e. C <= ~4096).

    Differentiable via a custom VJP whose backward is the plain-XLA tail
    math (same recompute pattern as the attention kernels' fallback) — the
    frozen backbone never exercises it, but fine-tuning configs may.
    """
    return _mlp_tail_vjp(h, w2, b2, res, gamma, beta, eps, gelu, ln,
                         block_m, block_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _mlp_tail_vjp(h, w2, b2, res, gamma, beta, eps, gelu, ln,
                  block_m, block_k):
    return _mlp_tail_call(h, w2, b2, res, gamma, beta, eps, gelu, ln,
                          block_m, block_k)


def _mlp_tail_fwd(h, w2, b2, res, gamma, beta, eps, gelu, ln,
                  block_m, block_k):
    out = _mlp_tail_vjp(h, w2, b2, res, gamma, beta, eps, gelu, ln,
                        block_m, block_k)
    return out, (h, w2, b2, res, gamma, beta)


def _mlp_tail_bwd(eps, gelu, ln, block_m, block_k, resids, ct):
    h, w2, b2, res, gamma, beta = resids
    if ln:
        def f(h, w2, b2, res, gamma, beta):
            return mlp_tail_reference(h, w2, b2, res, gamma, beta,
                                      eps=eps, gelu=gelu, ln=True)

        _, vjp = jax.vjp(f, h, w2, b2, res, gamma, beta)
        return vjp(ct)

    def f4(h, w2, b2, res):
        return mlp_tail_reference(h, w2, b2, res, eps=eps, gelu=gelu,
                                  ln=False)

    _, vjp = jax.vjp(f4, h, w2, b2, res)
    return vjp(ct) + (None, None)


_mlp_tail_vjp.defvjp(_mlp_tail_fwd, _mlp_tail_bwd)


def _mlp_tail_call(h, w2, b2, res, gamma, beta, eps, gelu, ln,
                   block_m, block_k):
    M, F = h.shape
    C = w2.shape[1]
    block_m = min(block_m, _round_up(M, 128))
    block_k = min(block_k, F)
    m_pad = _round_up(M, block_m)
    if m_pad != M:
        h = jnp.pad(h, ((0, m_pad - M), (0, 0)))
        res = jnp.pad(res, ((0, m_pad - M), (0, 0)))
    grid = (m_pad // block_m, F // block_k)
    row_spec = pl.BlockSpec((1, C), lambda i, k: (0, 0))
    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, k: (i, k)),
        pl.BlockSpec((block_k, C), lambda i, k: (k, 0)),
        row_spec,
        pl.BlockSpec((block_m, C), lambda i, k: (i, 0)),
    ]
    out_spec = pl.BlockSpec((block_m, C), lambda i, k: (i, 0))
    out_shape = jax.ShapeDtypeStruct((m_pad, C), h.dtype)
    operands = [h, w2, b2.reshape(1, C).astype(jnp.float32), res]
    if ln:
        in_specs += [row_spec, row_spec]
        operands += [gamma.reshape(1, C).astype(jnp.float32),
                     beta.reshape(1, C).astype(jnp.float32)]
    outs = pl.pallas_call(
        functools.partial(_mlp_tail_kernel, eps=eps, gelu=gelu, ln=ln),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec, out_spec] if ln else [out_spec],
        out_shape=[out_shape, out_shape] if ln else [out_shape],
        scratch_shapes=[pltpu.VMEM((block_m, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*operands)
    if ln:
        return outs[0][:M], outs[1][:M]
    return outs[0][:M]


def mlp_tail_reference(h, w2, b2, res, gamma=None, beta=None,
                       eps: float = 1e-6, gelu: bool = False,
                       ln: bool = True):
    """Plain-XLA math of mlp_tail (CPU fallback / probe baseline)."""
    if gelu:
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
    x = (jnp.dot(h, w2, preferred_element_type=jnp.float32)
         + b2.astype(jnp.float32) + res.astype(jnp.float32))
    if not ln:
        return x.astype(h.dtype)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * gamma + beta
    return x.astype(h.dtype), y.astype(h.dtype)

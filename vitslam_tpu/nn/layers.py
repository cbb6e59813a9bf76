"""Transformer building blocks (flax.linen): Mlp, LayerScale, qk-norm
Attention (self + cross), pre-norm blocks with RoPE.

Reference parity: vggt.layers Block/Attention/Mlp/LayerScale (imported at
aligned_vggt/heads/alignment_head.py:8-9) and
aligned_vggt/layers/cross_attention.py (CrossAttention:15,
CrossAttentionBlock:80, DecoderBlock:134).

TPU-first choices: params are fp32 with a bf16 compute dtype (`dtype`),
attention dispatches to the Pallas flash kernel via
ops.scaled_dot_product_attention, and RoPE is applied functionally to q/k in
fp32 before the kernel.
"""
from __future__ import annotations

import math
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import scaled_dot_product_attention
from ..ops.quant import int8_enabled, int8_matmul
from .rope import apply_rope_1d, apply_rope_2d, apply_rope_cached

Dtype = jnp.dtype

# Default softmax shift for the bounded-logit flash path; raised at runtime
# to the provable per-weights bound when the learned qk-norm gains exceed it.
_QK_STATIC_MAX = 24.0


def qk_logit_bound(q_params: dict, k_params: dict, dh: int):
    """Provable upper bound on qk-normed attention logits, from the learned
    LayerNorm affine parameters.

    After LayerNorm the row has exactly ||x̂||₂ = √dh (zero mean, unit
    variance over dh features), so ||q||₂ ≤ max|g_q|·√dh + ||b_q||₂, RoPE
    preserves norms, and |logit| = |q·k|/√dh ≤ bound(q)·bound(k)/√dh."""
    sq = math.sqrt(dh)

    def row_bound(p):
        r = jnp.max(jnp.abs(p["scale"])) * sq
        if "bias" in p:
            r = r + jnp.linalg.norm(p["bias"])
        return r

    return (row_bound(q_params) * row_bound(k_params) / sq).astype(jnp.float32)


def _qk_shift(q_norm: nn.LayerNorm, k_norm: nn.LayerNorm, dh: int):
    """Overflow-proof softmax shift for the bounded-logit flash path.

    max(24, provable bound): ordinary weights keep round-1 numerics, while
    trained/converted weights whose qk-norm gains drift past the old
    hard-coded 24 raise the shift instead of silently overflowing exp
    (VERDICT.md Weak #4). The fast path stays *exact* as long as the bound
    is within ~80 of the true row max (fp32 exp underflow); gains of O(1)
    keep it far below that."""
    bound = qk_logit_bound(q_norm.variables["params"],
                           k_norm.variables["params"], dh)
    return jax.lax.stop_gradient(jnp.maximum(_QK_STATIC_MAX, bound))


def _is_rope_cache(pos) -> bool:
    return isinstance(pos, tuple) and len(pos) == 3 and isinstance(pos[2], int)


# below this many tokens XLA's fused small attention beats a kernel launch;
# above the max, in-kernel LN/RoPE prep would be recomputed once per q
# block when streaming K (measured: 75/30 point-aligned 20.6 -> 15.4 FPS),
# so the large-N path preps ONCE in the flat layout and streams through
# ops.fused_attention.flat_flash_attention instead (still zero relayouts)
_FUSED_MIN_TOKENS = 384
_FUSED_MAX_TOKENS = 4096


def _fused_attention_enabled() -> bool:
    env = os.environ.get("VITSLAM_FUSED_ATTN", "auto")
    if env in ("0", "xla"):
        return False
    if env == "1":
        return True
    from ..ops.attention import _on_tpu

    return _on_tpu()


# fused block-tail path (ops/mlp_tail.py): below this many rows the matmul
# is too small for the kernel's streaming schedule to pay off
_TAIL_MIN_ROWS = 1024


def _mlp_tail_enabled() -> bool:
    return bool(_tail_sites())


def _tail_sites() -> frozenset:
    """Which block tails route through the Pallas epilogue kernel:
    VITSLAM_MLP_TAIL = 1 (both sites) | mlp (fc2 tail only) | proj |
    0/off/xla/unset (DEFAULT: off).

    Off by default on purpose: the kernel beats XLA's fc2 output fusion in
    ISOLATION (107 vs 76 TF/s at the square M=6.9k shape,
    scripts/mlp_tail_probe.py) but LOSES in the whole aggregator
    (scripts/tail_ab_probe.py, B=4 square 518²: mlp +13%, proj +6%, both
    +17% vs unfused — XLA hides the epilogue behind neighboring ops'
    scheduling slack that a pallas_call boundary forfeits; BENCH.md
    round-3 negative results)."""
    env = os.environ.get("VITSLAM_MLP_TAIL", "0")
    if env in ("", "0", "off", "xla", "auto"):
        return frozenset()
    if env == "1":
        return frozenset(("mlp", "proj"))
    if env in ("mlp", "proj"):
        return frozenset((env,))
    return frozenset()


def ln_apply(x, scale, bias, dtype, eps: float = 1e-6):
    """Functional LayerNorm matching flax nn.LayerNorm's fast-variance
    math bit-for-bit (fp32 stats, max(0, E[x²]−E[x]²), cast to dtype)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mean2 - mean * mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dtype)


class _LNParams(nn.Module):
    """Creates nn.LayerNorm-compatible params ({scale, bias}, fp32) WITHOUT
    applying them — so the fused block-tail path can fold the LN into the
    Pallas epilogue kernel while the unfused path applies ln_apply. The
    param tree is identical to nn.LayerNorm's (converter-stable)."""
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class _DenseParams(nn.Module):
    """QuantizableDense twin with statically-known in_features whose params
    are reachable without running the matmul (setup-style) — the fused
    block-tail path reads .kernel/.bias for the Pallas epilogue kernel.
    Param names/shapes/init identical to nn.Dense/QuantizableDense."""
    in_features: int
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    quant: bool = False

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features),
                                 jnp.float32)
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.features,), jnp.float32)

    def __call__(self, x):
        if self.quant and int8_enabled():
            return int8_matmul(x, self.kernel,
                               self.bias if self.use_bias else None,
                               self.dtype)
        y = jnp.dot(x.astype(self.dtype), self.kernel.astype(self.dtype))
        if self.use_bias:
            y = y + self.bias.astype(self.dtype)
        return y


def _dense_tail(dense: "_DenseParams", h, res, ls_gamma, tail_ln, gelu: bool):
    """res + ls⊙(dense(act(h))) [+ LayerNorm] via the ops.mlp_tail Pallas
    kernel, LayerScale folded into the weights (a per-column scale commutes
    with the matmul). Returns (x', LN(x')) when tail_ln is given, else x'."""
    from ..ops.mlp_tail import mlp_tail

    w = dense.kernel
    b = dense.bias if dense.use_bias else jnp.zeros((dense.features,),
                                                    jnp.float32)
    if ls_gamma is not None:
        w = w * ls_gamma[None, :]
        b = b * ls_gamma
    h2 = h.reshape(-1, h.shape[-1])
    r2 = res.reshape(-1, res.shape[-1])
    if tail_ln is not None:
        x, y = mlp_tail(h2, w.astype(h2.dtype), b, r2, tail_ln[0], tail_ln[1],
                        gelu=gelu, ln=True)
        return x.reshape(res.shape), y.reshape(res.shape)
    x = mlp_tail(h2, w.astype(h2.dtype), b, r2, gelu=gelu, ln=False)
    return x.reshape(res.shape)


def _qk_shift_from(qp, kp, dh: int):
    """_qk_shift from raw (scale, bias) param pairs (fused path)."""
    bound = qk_logit_bound({"scale": qp[0], "bias": qp[1]},
                           {"scale": kp[0], "bias": kp[1]}, dh)
    return jax.lax.stop_gradient(jnp.maximum(_QK_STATIC_MAX, bound))


def _apply_rope(q, k, pos_q, pos_k, mode: Optional[str], base: float):
    """Apply RoPE to q/k. ``pos`` may be integer position arrays (angles
    computed inline) or a precomputed (cos, sin, nsplit) cache from
    rope.rope_cache_1d/2d — callers with hot loops (the scanned aggregator)
    hoist the trig out by passing caches."""
    if mode is None or pos_q is None:
        return q, k
    if _is_rope_cache(pos_q):
        return apply_rope_cached(q, pos_q), apply_rope_cached(k, pos_k)
    fn = apply_rope_1d if mode == "1d" else apply_rope_2d
    return fn(q, pos_q, base), fn(k, pos_k, base)


class QuantizableDense(nn.Module):
    """nn.Dense twin (identical param names/shapes/init) that routes
    through the int8 MXU path when the module was built with quant=True AND
    VITSLAM_INT8=1 (ops/quant.py — opt-in frozen-backbone serving mode)."""
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        if self.quant and int8_enabled():
            return int8_matmul(x, kernel, bias, self.dtype)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class Mlp(nn.Module):
    """Two-layer GELU MLP.

    With ``tail=(res, ls_gamma)`` the caller asks for the fused tail:
    gelu + fc2 + LayerScale + residual add run in the ops.mlp_tail Pallas
    kernel (the caller gates on _mlp_tail_enabled()); the returned value is
    the residual-stream output res + ls⊙fc2(gelu(fc1(x)))."""
    hidden_features: int
    out_features: int
    bias: bool = True
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, tail=None):
        if tail is not None:
            fc1 = QuantizableDense(self.hidden_features, use_bias=self.bias,
                                   dtype=self.dtype, quant=self.quant,
                                   name="fc1")
            fc2 = _DenseParams(self.hidden_features, self.out_features,
                               self.bias, self.dtype, self.quant, name="fc2")
            return _dense_tail(fc2, fc1(x), tail[0], tail[1], None, gelu=True)
        x = QuantizableDense(self.hidden_features, use_bias=self.bias,
                             dtype=self.dtype, quant=self.quant,
                             name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        if os.environ.get("VITSLAM_GELU_BARRIER", "1") == "1":
            # stop XLA fusing the gelu into the fc2 matmul's contracting
            # operand (profiled: the combined fusion recomputes the gelu per
            # K tile and runs at ~62 TF/s vs ~245 for the clean fc1 matmul;
            # materializing the activation costs one cheap HBM round trip)
            x = jax.lax.optimization_barrier(x)
        x = QuantizableDense(self.out_features, use_bias=self.bias,
                             dtype=self.dtype, quant=self.quant,
                             name="fc2")(x)
        return x


class LayerScale(nn.Module):
    """Per-channel learnable scaling, gamma init to `init_values`."""
    dim: int
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (self.dim,), jnp.float32
        )
        return x * gamma.astype(x.dtype)


class HeadLayerNorm(nn.Module):
    """Per-head LayerNorm over ``head_dim``-sized feature groups.

    Drop-in for ``nn.LayerNorm`` on the (B, H, N, dh) layout (same param
    names/shapes, same eps/statistics), plus a ``flat=True`` mode that
    normalizes the flat (B, N, H*dh) layout directly: group mean/E[x^2]
    ride two tiny MXU matmuls against a constant pooling matrix and are
    broadcast back the same way — no lane reduction and no (B, H, N, dh)
    relayout, which is where the naive per-head path loses half its lanes
    (head dim 64 on 128-lane registers)."""
    num_heads: int
    head_dim: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    def setup(self):
        # setup-style params so the fused-attention path can read them
        # (nn/ops fused_qkv_attention applies the LN in-kernel) without a
        # data pass; names/shapes identical to nn.LayerNorm's
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.head_dim,), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.head_dim,), jnp.float32)

    def __call__(self, x, flat: bool = False):
        dh = self.head_dim
        scale, bias = self.scale, self.bias
        if not flat:  # (..., dh): plain LayerNorm math over the last axis
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - mean**2
            y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
            return (y * scale + bias).astype(self.dtype)
        h = self.num_heads
        C = h * dh
        pool = jnp.asarray(np.kron(np.eye(h), np.ones((dh, 1)) / dh),
                           jnp.float32)  # (C, h): per-head mean
        spread = jnp.asarray(np.kron(np.eye(h), np.ones((1, dh))),
                             jnp.float32)  # (h, C): broadcast back
        xf = x.astype(jnp.float32)
        mean_h = xf @ pool                       # (B, N, h)
        m2_h = jnp.square(xf) @ pool
        inv_h = jax.lax.rsqrt(m2_h - jnp.square(mean_h) + self.eps)
        mean_l = mean_h @ spread                 # (B, N, C)
        inv_l = inv_h @ spread
        y = (xf - mean_l) * inv_l
        return (y * jnp.tile(scale, h) + jnp.tile(bias, h)).astype(self.dtype)


class Attention(nn.Module):
    """Multi-head self-attention with optional per-head qk LayerNorm and RoPE.

    rope: None | '1d' | '2d' — positions passed at call time.

    When qk-norm is on and a precomputed RoPE cache is supplied (the scanned
    aggregator's hot path), the q/k prep runs in the flat (B, N, C) layout:
    grouped LayerNorm + lane-permutation RoPE (see HeadLayerNorm /
    rope.apply_rope_flat), with a single relayout into the kernel's
    (B, H, N, dh) — instead of LN/RoPE elementwise chains over half-empty
    64-lane registers."""
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    proj_bias: bool = True
    qk_norm: bool = True
    rope: Optional[str] = None
    rope_base: float = 100.0
    dtype: Dtype = jnp.float32
    quant: bool = False
    # named mesh axis for sequence parallelism: tokens are sharded over
    # this axis (must be called inside shard_map); K/V are all-gathered
    # before attention so each device computes exact attention for its
    # local queries (SURVEY §5.7's S*P-axis sharding for the 75-frame
    # large-chunk variants)
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, pos=None, kv=None, pos_kv=None, tail=None):
        """Self-attention over ``x``; with ``kv`` given, queries come from
        ``x`` and keys/values from ``kv`` through the SAME qkv projection
        (KV-compressed global attention: the aggregator's token-merged
        mode feeds anchor-full + pooled tokens here). ``pos_kv`` is the
        RoPE cache for the kv token set.

        ``tail=(res, ls_gamma, ln_scale, ln_bias)`` fuses the output
        projection with LayerScale + residual add + the following
        LayerNorm in the ops.mlp_tail Pallas kernel (caller gates on
        _mlp_tail_enabled()) and returns (x', LN(x'))."""
        B, N, C = x.shape
        h = self.num_heads
        dh = self.dim // h
        qkv_dense = QuantizableDense(3 * self.dim, use_bias=self.qkv_bias,
                                     dtype=self.dtype, quant=self.quant,
                                     name="qkv")
        qkv = qkv_dense(x)
        qkv_k = qkv_dense(kv) if kv is not None else qkv
        proj = _DenseParams(self.dim, self.dim, self.proj_bias, self.dtype,
                            self.quant, name="proj")

        def _proj(out):
            if tail is not None:
                res, ls_gamma, g2, b2 = tail
                return _dense_tail(proj, out, res, ls_gamma, (g2, b2),
                                   gelu=False)
            return proj(out)

        if pos_kv is None:
            pos_kv = pos
        static_max = None
        sp = self.seq_axis is not None
        fast = self.qk_norm and _is_rope_cache(pos) \
            and (kv is None or _is_rope_cache(pos_kv))
        # fully-fused path: qkv-packed Pallas kernel (per-head LN + RoPE +
        # attention in one kernel, no relayouts). Taken on TPU when the
        # RoPE cache form is available (or neither LN nor RoPE is needed).
        fusable = fast or (not self.qk_norm and self.rope is None
                           and pos is None)
        if (fusable and not sp and kv is None and _fused_attention_enabled()
                and _FUSED_MIN_TOKENS <= N <= _FUSED_MAX_TOKENS):
            from ..ops.fused_attention import fused_qkv_attention

            kwargs = dict(num_heads=h)
            if fast:
                qn = HeadLayerNorm(h, dh, dtype=self.dtype, name="q_norm")
                kn = HeadLayerNorm(h, dh, dtype=self.dtype, name="k_norm")
                qp, kp = (qn.scale, qn.bias), (kn.scale, kn.bias)
                cos, sin, nsplit = pos
                kwargs.update(cos=cos, sin=sin, q_ln=qp, k_ln=kp,
                              nsplit=nsplit,
                              static_max=_qk_shift_from(qp, kp, dh))
            out = fused_qkv_attention(qkv, **kwargs)
            return _proj(out)
        if fast:
            from .rope import apply_rope_flat

            qn = HeadLayerNorm(h, dh, dtype=self.dtype, name="q_norm")
            kn = HeadLayerNorm(h, dh, dtype=self.dtype, name="k_norm")
            cos, sin, nsplit = pos
            cos_k, sin_k, nsplit_k = pos_kv
            qf = apply_rope_flat(qn(qkv[..., :C], flat=True), cos, sin, h, nsplit)
            kf = apply_rope_flat(kn(qkv_k[..., C:2 * C], flat=True), cos_k,
                                 sin_k, h, nsplit_k)
            vf = qkv_k[..., 2 * C:]
            static_max = _qk_shift(qn, kn, dh)
            if sp:
                # sequence parallel: queries stay local, K/V gathered once
                # per layer (prepped, so the gather also amortizes LN/RoPE)
                kf = jax.lax.all_gather(kf, self.seq_axis, axis=1, tiled=True)
                vf = jax.lax.all_gather(vf, self.seq_axis, axis=1, tiled=True)
            nk = kf.shape[1]
            if _fused_attention_enabled() and nk > _FUSED_MAX_TOKENS:
                # large-N path: prep ran ONCE above in the flat layout;
                # stream K through the flat-layout kernel — no (B,H,N,dh)
                # relayout on either side, no per-q-block prep recompute
                from ..ops.fused_attention import flat_flash_attention

                out = flat_flash_attention(qf, kf, vf, num_heads=h,
                                           static_max=static_max)
                return _proj(out)
            q = qf.reshape(B, N, h, dh).swapaxes(1, 2)
            k = kf.reshape(B, nk, h, dh).swapaxes(1, 2)
            v = vf.reshape(B, nk, h, dh).swapaxes(1, 2)
        else:
            nk_in = qkv_k.shape[1]
            q = qkv[..., :C].reshape(B, N, h, dh)
            k = qkv_k[..., C:2 * C].reshape(B, nk_in, h, dh)
            v = qkv_k[..., 2 * C:].reshape(B, nk_in, h, dh)
            q = jnp.swapaxes(q, 1, 2)  # (B, h, N, dh)
            k = jnp.swapaxes(k, 1, 2)
            v = jnp.swapaxes(v, 1, 2)
            if self.qk_norm:
                qn = HeadLayerNorm(h, dh, dtype=self.dtype, name="q_norm")
                kn = HeadLayerNorm(h, dh, dtype=self.dtype, name="k_norm")
                q = qn(q)
                k = kn(k)
                # qk-norm bounds the logits -> the flash kernel can use a
                # fixed softmax shift and skip online max tracking
                static_max = _qk_shift(qn, kn, dh)
            q, k = _apply_rope(q, k, pos, pos_kv, self.rope, self.rope_base)
            if sp:
                k = jax.lax.all_gather(k, self.seq_axis, axis=2, tiled=True)
                v = jax.lax.all_gather(v, self.seq_axis, axis=2, tiled=True)
        out = scaled_dot_product_attention(q, k, v, static_max=static_max)
        out = jnp.swapaxes(out, 1, 2).reshape(B, N, C)
        return _proj(out)


class CrossAttention(nn.Module):
    """Cross-attention with separate q/k/v projections and distinct RoPE
    position sets for queries and keys.

    Reference parity: aligned_vggt/layers/cross_attention.py:15-78 — note the
    reference's SDPA all-ones-mask + B<7000 guard is a torch-2.5.1 crash
    workaround with no semantics; the Pallas/XLA path needs no equivalent.
    """
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    proj_bias: bool = True
    qk_norm: bool = False
    rope: Optional[str] = None
    rope_base: float = 100.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, pos=None):
        B, N, C = x.shape
        M = y.shape[1]
        h = self.num_heads
        dh = self.dim // h
        dense = lambda name: nn.Dense(self.dim, use_bias=self.qkv_bias,
                                      dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q = dense("q")(x).reshape(B, N, h, dh).swapaxes(1, 2)
        k = dense("k")(y).reshape(B, M, h, dh).swapaxes(1, 2)
        v = dense("v")(y).reshape(B, M, h, dh).swapaxes(1, 2)
        static_max = None
        if self.qk_norm:
            qn = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="q_norm")
            kn = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="k_norm")
            q = qn(q)
            k = kn(k)
            static_max = _qk_shift(qn, kn, dh)
        pos_q, pos_k = pos if pos is not None else (None, None)
        q, k = _apply_rope(q, k, pos_q, pos_k, self.rope, self.rope_base)
        out = scaled_dot_product_attention(q, k, v, static_max=static_max)
        out = jnp.swapaxes(out, 1, 2).reshape(B, N, C)
        return nn.Dense(self.dim, use_bias=self.proj_bias,
                        dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class Block(nn.Module):
    """Pre-norm ViT block: x + ls1(attn(norm1 x)), x + ls2(mlp(norm2 x)).

    ``fused_tail=True`` (the frozen scanned backbone sets it) routes both
    residual tails through the ops.mlp_tail Pallas kernel on TPU:
    proj+LayerScale+residual+norm2 fuse into the attention epilogue and
    gelu+fc2+LayerScale+residual into the MLP epilogue — the XLA
    alternative materializes these as ~82 TF/s output fusions (BENCH.md
    round-2 profiled breakdown). The kernel path has no VJP; it is only
    legal where no cotangents flow (the frozen backbone)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    qk_norm: bool = True
    init_values: Optional[float] = None
    rope: Optional[str] = None
    rope_base: float = 100.0
    dtype: Dtype = jnp.float32
    quant: bool = False
    seq_axis: Optional[str] = None
    fused_tail: bool = False

    @nn.compact
    def __call__(self, x, pos=None, kv=None, pos_kv=None):
        C = self.dim
        if self.init_values is not None:
            # the ones-probe returns gamma itself; applying it is then a
            # plain multiply in either path (bit-identical to LayerScale)
            ones = jnp.ones((C,), jnp.float32)
            ls1_g = LayerScale(C, self.init_values, name="ls1")(ones)
            ls2_g = LayerScale(C, self.init_values, name="ls2")(ones)
        else:
            ls1_g = ls2_g = None
        attn = Attention(self.dim, self.num_heads, self.qkv_bias, self.proj_bias,
                         self.qk_norm, self.rope, self.rope_base, self.dtype,
                         quant=self.quant, seq_axis=self.seq_axis, name="attn")
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                  quant=self.quant, name="mlp")
        norm1 = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                             name="norm1")
        g2, b2 = _LNParams(C, name="norm2")()
        y = norm1(x)
        kv_n = norm1(kv) if kv is not None else None
        rows = int(np.prod(x.shape[:-1]))
        sites = _tail_sites() if (
            self.fused_tail and rows >= _TAIL_MIN_ROWS
            and not (self.quant and int8_enabled())) else frozenset()
        if "proj" in sites:
            x, y2 = attn(y, pos, kv=kv_n, pos_kv=pos_kv,
                         tail=(x, ls1_g, g2, b2))
        else:
            a = attn(y, pos, kv=kv_n, pos_kv=pos_kv)
            if ls1_g is not None:
                a = a * ls1_g.astype(a.dtype)
            x = x + a
            y2 = ln_apply(x, g2, b2, self.dtype)
        if "mlp" in sites:
            return mlp(y2, tail=(x, ls2_g))
        m = mlp(y2)
        if ls2_g is not None:
            m = m * ls2_g.astype(m.dtype)
        return x + m


class CrossAttentionBlock(nn.Module):
    """Pre-norm cross-attention block:
    x + ls1(cross_attn(norm1(x), norm3(y))), x + ls2(mlp(norm2(x))).

    Reference parity: aligned_vggt/layers/cross_attention.py:80-132.
    """
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    qk_norm: bool = True
    init_values: Optional[float] = None
    rope: Optional[str] = None
    rope_base: float = 100.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, pos=None):
        ls = (lambda name: LayerScale(self.dim, self.init_values, name=name)) \
            if self.init_values is not None else (lambda name: (lambda t: t))
        xn = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        yn = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm3")(y)
        ca = CrossAttention(self.dim, self.num_heads, self.qkv_bias, self.proj_bias,
                            self.qk_norm, self.rope, self.rope_base, self.dtype, name="cross_attn")
        x = x + ls("ls1")(ca(xn, yn, pos))
        xn = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        x = x + ls("ls2")(Mlp(int(self.dim * self.mlp_ratio), self.dim,
                              dtype=self.dtype, name="mlp")(xn))
        return x


class DecoderBlock(nn.Module):
    """Self-attention + cross-attention + MLP decoder block.

    Reference parity: aligned_vggt/layers/cross_attention.py:134-199 (defined
    for completeness; unused by the shipped models, as in the reference).
    """
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = True
    init_values: Optional[float] = None
    rope: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, pos=None):
        pos_q, pos_k = pos if pos is not None else (None, None)
        sa = Attention(self.dim, self.num_heads, self.qkv_bias, True,
                       self.qk_norm, self.rope, dtype=self.dtype, name="self_attn")
        ca = CrossAttention(self.dim, self.num_heads, self.qkv_bias, True,
                            self.qk_norm, self.rope, dtype=self.dtype, name="cross_attn")
        xn = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        x = x + sa(xn, pos_q)
        xn = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        yn = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm_y")(y)
        x = x + ca(xn, yn, (pos_q, pos_k))
        xn = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm3")(x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(xn)
        return x

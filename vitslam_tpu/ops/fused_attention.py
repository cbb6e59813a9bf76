"""Fused qkv-packed flash attention: per-head LayerNorm + RoPE + softmax +
PV in ONE Pallas kernel, consuming the qkv projection's packed output
directly and writing the attention output back in the flat (B, N, C)
layout.

Why (v5e xplane profile of the aggregator scan): the separate-prep path
spends more time on q/k/v relayouts ((B, N, H, dh) transposes cost
0.5-0.9 ms each at (10, 1374, 64)) and on the LN/RoPE elementwise fusions
than on the attention math itself. Here the kernel's BlockSpecs slice each
head's 64-lane group straight out of the (B, N, 3C) qkv array (grid axis 0
enumerates batch x head; lane-block index = head), so NO transpose ever
materializes, and the q/k prep runs on tiles already in VMEM:

  * per-head LayerNorm over the dh lanes (fp32 mean/E[x^2], flax eps);
  * RoPE via a constant (dh, dh) +-1 rotation matrix on the MXU
    (out = x*cos + (x @ P)*sin — rope.rope_rotation_matrix);
  * bounded-logit exp2 softmax with the caller's static shift (qk-norm
    bounds the logits — nn/layers.py::_qk_shift), or online max when
    unbounded; the denominator rides an MXU matvec against a ones vector;
  * the K-pad tail is masked (padded rows pass through LN as the bias
    vector, so their mass is NOT provably zero here, unlike the unfused
    MXU-sum trick).

Backward: custom VJP recomputes the same math with plain XLA (exact; the
backbone that uses this path is frozen in every reference config, so the
backward is traced but dead in training).

Reference parity: numerics equal HeadLayerNorm + apply_rope_flat +
flash_attention to fp tolerance (tests/test_fused_attention.py).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import (
    _LOG2E,
    NEG_INF,
    _round_up,
    _row_max,
    _single_k_blocks,
)

from .flash_attention import _dispatch_shift_variants, _softmax_shift_mode

_LN_EPS = 1e-6


def _prep_tile(raw, cos_ref, sin_ref, rot_ref, s_ref, b_ref, do_ln, do_rope):
    """LayerNorm + RoPE on a (block, dh) tile, fp32 in, bf16-ish out."""
    x = raw.astype(jnp.float32)
    if do_ln:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
        x = (x - mean) * jax.lax.rsqrt(var + _LN_EPS)
        x = x * s_ref[0] + b_ref[0]
    if do_rope:
        cos = cos_ref[0].astype(jnp.float32)
        sin = sin_ref[0].astype(jnp.float32)
        rot = jax.lax.dot_general(
            x, rot_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        x = x * cos + rot * sin
    return x


def _fused_kernel(
    smax_ref, q_ref, k_ref, v_ref, *refs,
    kv_len: int, block_k: int, needs_mask: bool, bounded: bool,
    single_k: bool, do_ln: bool, do_rope: bool, qscale: float, dh: int,
    heads_per_block: int, sub_shift: bool, tns: bool = False,
):
    """One (batch*head_group, q_block, k_block) grid step.

    The q/k/v tiles are (block, G*dh) lane groups sliced straight out of
    the flat (B, N, 3C) qkv array (G = 128//dh heads per grid step — a
    128-lane block is the smallest Mosaic-legal lane slice); the kernel
    loops over the G sub-heads in registers, so no relayout ever touches
    HBM on either side.

    refs layout: [cos_q, sin_q, cos_k, sin_k]? (if do_rope)
                 [q_scale, q_bias, k_scale, k_bias]? (if do_ln)
                 [rot]? (if do_rope)
                 o_ref, m_scratch, l_scratch, acc_scratch."""
    i = 0
    if do_rope:
        cosq_ref, sinq_ref, cosk_ref, sink_ref = refs[i:i + 4]
        i += 4
    else:
        cosq_ref = sinq_ref = cosk_ref = sink_ref = None
    if do_ln:
        qs_ref, qb_ref, ks_ref, kb_ref = refs[i:i + 4]
        i += 4
    else:
        qs_ref = qb_ref = ks_ref = kb_ref = None
    if do_rope:
        rot_ref = refs[i]
        i += 1
    else:
        rot_ref = None
    o_ref, m_scratch, l_scratch, acc_scratch = refs[i:i + 4]

    kb = pl.program_id(2)
    nkb = pl.num_programs(2)
    G = heads_per_block

    @pl.when(jnp.logical_and(kb == 0, not single_k))
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q_tile = q_ref[0]
    k_tile = k_ref[0]
    v_tile = v_ref[0]
    outs = []
    for g in range(G):
        sl = slice(g * dh, (g + 1) * dh)
        q = _prep_tile(q_tile[:, sl], cosq_ref, sinq_ref, rot_ref, qs_ref,
                       qb_ref, do_ln, do_rope) * qscale
        k = _prep_tile(k_tile[:, sl], cosk_ref, sink_ref, rot_ref, ks_ref,
                       kb_ref, do_ln, do_rope)
        v = v_tile[:, sl]
        ones = jnp.ones((v.shape[0], 1), jnp.bfloat16)
        vv = jnp.concatenate([v, ones], axis=1)

        if single_k and tns:
            # transposed-accumulator variant (_flat_stream_tns_kernel's
            # trick for the whole-K path): S^T = K Q^T, O^T = [V|1]^T P^T
            # — the values matmul gets full output lanes (block_q) instead
            # of dh+1 = 65 of 128; one (gd, bq) transpose at the end.
            s_t = jax.lax.dot_general(
                k.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )  # (block_k, block_q)
            if needs_mask:
                r = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
                s_t = jnp.where(r < kv_len, s_t, NEG_INF)
            if bounded and not sub_shift:
                p_t = jnp.exp2(s_t).astype(jnp.bfloat16)
            else:
                shift = (smax_ref[0] if bounded
                         else jnp.max(s_t, axis=0, keepdims=True))
                p_t = jnp.exp2(s_t - shift).astype(jnp.bfloat16)
            pv_t = jax.lax.dot_general(
                vv, p_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (dh+1, block_q): contraction block_k, full lanes
            outs.append(pv_t[:dh] / jnp.maximum(pv_t[dh:], 1e-30))
            continue

        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (block_q, block_k) log2-domain logits
        if needs_mask:
            # padded K rows come out of LN as the bias vector -> real mass
            col = (kb * block_k
                   + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            s = jnp.where(col < kv_len, s, NEG_INF)

        if single_k:
            if bounded and not sub_shift:
                # shift cancels in pv/den (_softmax_shift_mode docstring)
                p = jnp.exp2(s).astype(jnp.bfloat16)
            else:
                shift = smax_ref[0] if bounded else _row_max(s)
                p = jnp.exp2(s - shift).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                p, vv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((pv[:, :-1] / jnp.maximum(pv[:, -1:], 1e-30)))
            continue

        gsl = slice(g, g + 1)
        if bounded:
            p = (jnp.exp2(s - smax_ref[0]) if sub_shift
                 else jnp.exp2(s)).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                p, vv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l_scratch[:, gsl] = l_scratch[:, gsl] + pv[:, -1:]
            acc_scratch[:, sl] = acc_scratch[:, sl] + pv[:, :-1]
        else:
            m_prev = m_scratch[:, gsl]
            m_next = jnp.maximum(m_prev, _row_max(s))
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next).astype(jnp.bfloat16)
            m_scratch[:, gsl] = m_next
            pv = jax.lax.dot_general(
                p, vv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l_scratch[:, gsl] = alpha * l_scratch[:, gsl] + pv[:, -1:]
            acc_scratch[:, sl] = acc_scratch[:, sl] * alpha + pv[:, :-1]

    if single_k:
        if tns:
            o_ref[0] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype).T
        else:
            o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)
        return

    @pl.when(kb == nkb - 1)
    def _finalize():
        parts = [acc_scratch[:, g * dh:(g + 1) * dh]
                 / jnp.maximum(l_scratch[:, g:g + 1], 1e-30)
                 for g in range(G)]
        o_ref[0] = jnp.concatenate(parts, axis=1).astype(o_ref.dtype)


def _fused_forward(qkv, cos, sin, qs, qb, ks, kb_, smax, *, num_heads,
                   scale, nsplit, do_ln, do_rope, bounded):
    B, N, C3 = qkv.shape
    C = C3 // 3
    h = num_heads
    dh = C // h
    # heads per grid step: a 128-lane block (G = 128//dh heads) is both the
    # smallest Mosaic-legal lane slice and the measured sweet spot — larger
    # groups (G=4/8 via VITSLAM_FUSED_G) lose to VMEM pressure from the
    # unrolled sub-head temporaries (G=4: 572 ms vs 521 ms encode; G=8
    # exceeds scoped VMEM outright at the 2560-token shape).
    env_g = os.environ.get("VITSLAM_FUSED_G", "auto")
    G = max(1, 128 // dh) if env_g == "auto" else int(env_g)
    G = min(G, h)
    while G > 1 and (h % G or (G * dh) % 128):
        G //= 2
    h2 = h // G                    # lane blocks per q/k/v section
    # K padded to a 512 multiple so power-of-two q blocks always tile it;
    # the in-kernel prep temporaries (fp32 LN/RoPE intermediates for the
    # whole K tile) cost ~7 B/logit-row-elem, so the q block is capped by a
    # 13 MB budget (G sub-heads share the tile sequentially); beyond 4096
    # keys the kernel streams K and k-prep is recomputed per q block.
    L = _round_up(N, 512)
    if L <= 4096:
        block_k = L
        kv_bytes = 2 * 2 * L * (2 * G * dh + 2)
        bq_cap = ((13 * 2**20 - kv_bytes) // (7 * L)) // 128 * 128
        block_q = 512 if bq_cap >= 512 else (256 if bq_cap >= 256 else 128)
    else:
        block_q, block_k = 512, 1024
    n_pad = _round_up(N, max(block_q, block_k))
    if n_pad != N:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - N), (0, 0)))
        if do_rope:
            cos = jnp.pad(cos, ((0, 0), (0, n_pad - N), (0, 0)))
            sin = jnp.pad(sin, ((0, 0), (0, n_pad - N), (0, 0)))

    gd = G * dh  # 128 (or dh when dh >= 128)
    grid = (B * h2, n_pad // block_q, n_pad // block_k)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, block_q, gd), lambda b, i, j: (b // h2, i, b % h2)),
        pl.BlockSpec((1, block_k, gd),
                     lambda b, i, j: (b // h2, j, h2 + b % h2)),
        pl.BlockSpec((1, block_k, gd),
                     lambda b, i, j: (b // h2, j, 2 * h2 + b % h2)),
    ]
    args = [smax, qkv, qkv, qkv]
    if do_rope:
        in_specs += [
            pl.BlockSpec((1, block_q, dh), lambda b, i, j: (b // h2, i, 0)),
            pl.BlockSpec((1, block_q, dh), lambda b, i, j: (b // h2, i, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, i, j: (b // h2, j, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, i, j: (b // h2, j, 0)),
        ]
        args += [cos, sin, cos, sin]
    if do_ln:
        in_specs += [pl.BlockSpec((1, dh), lambda b, i, j: (0, 0))] * 4
        args += [qs.reshape(1, dh), qb.reshape(1, dh),
                 ks.reshape(1, dh), kb_.reshape(1, dh)]
    if do_rope:
        from ..nn.rope import rope_rotation_matrix

        rot = jnp.asarray(rope_rotation_matrix(dh, nsplit, 1), jnp.bfloat16)
        in_specs += [pl.BlockSpec((dh, dh), lambda b, i, j: (0, 0))]
        args += [rot]

    single_k = n_pad // block_k == 1
    # Transposed-accumulator softmax/PV (the whole-K analogue of
    # _flat_stream_tns_kernel): DEFAULT ON where it applies — measured
    # on-chip round 5: feature 5/1 58.9 -> 60.0 FPS, square-518^2 frame
    # attention 14.1 -> 14.6 (BENCH.md round-5 TNS table). "0" opts out.
    env_tns = os.environ.get("VITSLAM_FUSED_TNS", "auto")
    tns = single_k if env_tns == "auto" else env_tns == "1"
    if tns and not single_k:
        # The variant only exists for the whole-K (single_k) path; warn on
        # an EXPLICIT request instead of silently measuring the std
        # accumulation under a tns flag (ADVICE r4).
        import warnings

        warnings.warn(
            f"VITSLAM_FUSED_TNS=1 ignored: N_pad={n_pad} streams K "
            f"(block_k={block_k}); the tns variant only applies when the "
            f"whole K fits one block (<=4096 tokens)", stacklevel=2)
        tns = False

    def call(sub_shift):
        return pl.pallas_call(
            functools.partial(
                _fused_kernel, kv_len=N, block_k=block_k,
                needs_mask=(n_pad != N), bounded=bounded,
                single_k=single_k, do_ln=do_ln,
                do_rope=do_rope, qscale=scale * _LOG2E, dh=dh,
                heads_per_block=G, sub_shift=sub_shift, tns=tns,
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, block_q, gd),
                                   lambda b, i, j: (b // h2, i, b % h2)),
            out_shape=jax.ShapeDtypeStruct((B, n_pad, C), qkv.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, G), jnp.float32),
                pltpu.VMEM((block_q, G), jnp.float32),
                pltpu.VMEM((block_q, gd), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(*args)

    if bounded:
        out = _dispatch_shift_variants(call, args[0], _softmax_shift_mode())
    else:
        out = call(True)  # online-max path: sub_shift is never read
    return out[:, :N]


def _fused_reference(qkv, cos, sin, qs, qb, ks, kb_, *, num_heads, scale,
                     nsplit, do_ln, do_rope):
    """Plain-XLA reference of the fused kernel's math (VJP recompute path +
    CPU fallback): flat-layout LN + RoPE, standard softmax attention."""
    from ..nn.rope import apply_rope_flat

    B, N, C3 = qkv.shape
    C = C3 // 3
    h = num_heads
    dh = C // h

    def prep(x, s_, b_, cos_, sin_):
        xf = x.astype(jnp.float32).reshape(B, N, h, dh)
        if do_ln:
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
            xf = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
            xf = xf * s_ + b_
        xf = xf.reshape(B, N, C)
        if do_rope:
            xf = apply_rope_flat(xf, cos_.astype(jnp.float32),
                                 sin_.astype(jnp.float32), h, nsplit)
        return xf.reshape(B, N, h, dh).transpose(0, 2, 1, 3)

    q = prep(qkv[..., :C], qs, qb, cos, sin)
    k = prep(qkv[..., C:2 * C], ks, kb_, cos, sin)
    v = qkv[..., 2 * C:].reshape(B, N, h, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.bfloat16),
                   k.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    return o.transpose(0, 2, 1, 3).reshape(B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _fused(qkv, cos, sin, qs, qb, ks, kb_, smax, num_heads, scale, nsplit,
           do_ln, do_rope, bounded):
    return _fused_forward(qkv, cos, sin, qs, qb, ks, kb_, smax,
                          num_heads=num_heads, scale=scale, nsplit=nsplit,
                          do_ln=do_ln, do_rope=do_rope, bounded=bounded)


def _fused_fwd(qkv, cos, sin, qs, qb, ks, kb_, smax, num_heads, scale,
               nsplit, do_ln, do_rope, bounded):
    out = _fused_forward(qkv, cos, sin, qs, qb, ks, kb_, smax,
                         num_heads=num_heads, scale=scale, nsplit=nsplit,
                         do_ln=do_ln, do_rope=do_rope, bounded=bounded)
    return out, (qkv, cos, sin, qs, qb, ks, kb_)


def _fused_bwd(num_heads, scale, nsplit, do_ln, do_rope, bounded, res, g):
    qkv, cos, sin, qs, qb, ks, kb_ = res
    f = lambda *a: _fused_reference(*a, num_heads=num_heads, scale=scale,
                                    nsplit=nsplit, do_ln=do_ln,
                                    do_rope=do_rope)
    out, vjp = jax.vjp(f, qkv, cos, sin, qs, qb, ks, kb_)
    grads = vjp(g.astype(out.dtype))
    return grads + (jnp.zeros((1,), jnp.float32),)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _flat_stream_kernel(
    smax_ref, q_ref, k_ref, v_ref, o_ref, l_scratch, acc_scratch, *,
    n_pad_keys: int, dh: int, heads_per_block: int, sub_shift: bool,
):
    """Streaming flash attention over PRE-PREPPED flat-layout q/k/v.

    One (batch*head_group, q_block, k_block) grid step. Unlike
    _fused_kernel there is NO in-kernel LN/RoPE — the caller prepped q/k
    once in the flat layout (HeadLayerNorm flat=True + apply_rope_flat)
    and folded scale*log2(e) into q, so streaming K costs no prep
    recompute (the failure mode that sank the in-kernel-prep streaming
    variant: 20.6 -> 15.4 FPS at 75/30). Bounded-logit softmax only
    (qk-norm backbone attention): fixed shift, no online max.

    Padded keys are zero rows -> s = 0 -> each contributes exactly
    exp2(-shift) of mass to the denominator and nothing to the
    accumulator (v rows are zero; only the in-kernel ones column is
    nonzero), so the tail needs no per-logit mask — the total pad mass
    is subtracted from l at finalize.
    """
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)
    G = heads_per_block

    @pl.when(kb == 0)
    def _init():
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q_tile = q_ref[0]
    k_tile = k_ref[0]
    v_tile = v_ref[0]
    shift = smax_ref[0]
    bq = q_tile.shape[0]
    bk = k_tile.shape[0]
    inner = int(os.environ.get("VITSLAM_FLAT_INNER_K", "0")) or bk
    for g in range(G):
        sl = slice(g * dh, (g + 1) * dh)
        for k0 in range(0, bk, inner):
            ks = slice(k0, k0 + inner)
            s = jax.lax.dot_general(
                q_tile[:, sl], k_tile[ks, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (block_q, inner) log2-domain logits (scale pre-folded)
            # shift cancels in acc/l (_softmax_shift_mode docstring);
            # measured on-chip: sub vs nosub is a wash, default = sub
            p = (jnp.exp2(s - shift) if sub_shift
                 else jnp.exp2(s)).astype(jnp.bfloat16)
            v = v_tile[ks, sl]
            ones = jnp.ones((v.shape[0], 1), jnp.bfloat16)
            pv = jax.lax.dot_general(
                p, jnp.concatenate([v, ones], axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l_scratch[:, g:g + 1] = l_scratch[:, g:g + 1] + pv[:, -1:]
            acc_scratch[:, sl] = acc_scratch[:, sl] + pv[:, :-1]

    @pl.when(kb == nkb - 1)
    def _finalize():
        # per-sub-head denominator broadcast via a constant 0/1 matmul
        # (NO lane concat/slice: a G-slice concat finalize measured ~120us
        # per (batch, q-block) boundary — the whole 31k-token shape's gap
        # to the 103k shape's TF/s)
        # padded keys are zero rows: each contributes exactly exp2(0-shift)
        # (or exp2(0) = 1 on the no-sub path) to l and nothing to acc
        pad_mass = (n_pad_keys * jnp.exp2(-shift) if sub_shift
                    else jnp.float32(n_pad_keys))
        rinv = 1.0 / jnp.maximum(l_scratch[:] - pad_mass, 1e-30)  # (bq, G)
        # (G, G*dh) 0/1 lane-group spread, built from iota (pallas kernels
        # cannot capture host constants)
        row = jax.lax.broadcasted_iota(jnp.int32, (G, G * dh), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (G, G * dh), 1)
        spread = (col // dh == row).astype(jnp.float32)
        dinv = jax.lax.dot_general(
            rinv, spread, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (acc_scratch[:] * dinv).astype(o_ref.dtype)


def _flat_stream_tns_kernel(
    smax_ref, q_ref, k_ref, v_ref, o_ref, l_scratch, acc_scratch, *,
    n_pad_keys: int, dh: int, heads_per_block: int, sub_shift: bool,
):
    """Transposed-accumulator variant of _flat_stream_kernel.

    The std kernel's values matmul P (bq, bk) @ [V|1] (bk, dh+1) writes
    only dh+1 = 65 of 128 output lanes — half the MXU's lane groups idle
    (scripts/mxu_dot_probe.py: 50.8 vs 68.2 TF/s std vs transposed at the
    streaming block shape). Here both matmuls run transposed:

        S^T = K Q^T   (bk, bq)  — contraction dh (same cost as S = Q K^T)
        O^T = [V|1]^T P^T (dh+1, bq) — contraction bk (FULL), lanes bq (FULL)

    so the N^2-sized values matmul gets full lane utilization; the only
    extra work is one (gd, bq) -> (bq, gd) transpose per q-block at
    finalize (amortized over all K blocks). l rides row dh of the
    accumulator exactly like the std kernel's ones column.
    """
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)
    G = heads_per_block

    @pl.when(kb == 0)
    def _init():
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q_tile = q_ref[0]
    k_tile = k_ref[0]
    v_tile = v_ref[0]
    shift = smax_ref[0]
    bk = k_tile.shape[0]
    inner = int(os.environ.get("VITSLAM_FLAT_INNER_K", "0")) or bk
    for g in range(G):
        sl = slice(g * dh, (g + 1) * dh)
        for k0 in range(0, bk, inner):
            ks = slice(k0, k0 + inner)
            s_t = jax.lax.dot_general(
                k_tile[ks, sl], q_tile[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (inner, block_q) log2-domain logits, transposed
            p_t = (jnp.exp2(s_t - shift) if sub_shift
                   else jnp.exp2(s_t)).astype(jnp.bfloat16)
            v = v_tile[ks, sl]  # (inner, dh)
            ones = jnp.ones((v.shape[0], 1), jnp.bfloat16)
            pv_t = jax.lax.dot_general(
                jnp.concatenate([v, ones], axis=1), p_t,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (dh+1, block_q): contraction inner (full), lanes bq (full)
            acc_scratch[sl, :] = acc_scratch[sl, :] + pv_t[:dh]
            l_scratch[g:g + 1, :] = l_scratch[g:g + 1, :] + pv_t[dh:]

    @pl.when(kb == nkb - 1)
    def _finalize():
        pad_mass = (n_pad_keys * jnp.exp2(-shift) if sub_shift
                    else jnp.float32(n_pad_keys))
        rinv = 1.0 / jnp.maximum(l_scratch[:] - pad_mass, 1e-30)  # (G, bq)
        # sublane-group spread (gd, G): row r selects head r // dh
        row = jax.lax.broadcasted_iota(jnp.int32, (G * dh, G), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (G * dh, G), 1)
        spread = (row // dh == col).astype(jnp.float32)
        dinv = jax.lax.dot_general(
            spread, rinv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, bq)
        o_ref[0] = (acc_scratch[:] * dinv).astype(o_ref.dtype).T


def _flat_forward(q, k, v, smax, *, num_heads, block_q, block_k):
    B, Nq, C = q.shape
    Nk = k.shape[1]
    h = num_heads
    dh = C // h
    G = max(1, 128 // dh)
    G = min(G, h)
    while G > 1 and (h % G or (G * dh) % 128):
        G //= 2
    h2 = h // G
    gd = G * dh
    block_q = min(block_q, _round_up(Nq, 128))
    block_k = min(block_k, _round_up(Nk, 128))
    nq_pad = _round_up(Nq, block_q)
    nk_pad = _round_up(Nk, block_k)
    if nq_pad != Nq:
        q = jnp.pad(q, ((0, 0), (0, nq_pad - Nq), (0, 0)))
    if nk_pad != Nk:
        k = jnp.pad(k, ((0, 0), (0, nk_pad - Nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, nk_pad - Nk), (0, 0)))

    grid = (B * h2, nq_pad // block_q, nk_pad // block_k)
    # transposed-accumulator kernel (full-lane values matmul); see
    # _flat_stream_tns_kernel. DEFAULT ON — measured on-chip round 5 at
    # the exact 75/30 setting: point 23.2 -> 26.0 FPS, pose 24.1 -> 26.9
    # (+12%; BENCH.md round-5 TNS table). VITSLAM_FLAT_TNS=0 opts out.
    tns = os.environ.get("VITSLAM_FLAT_TNS", "1") == "1"
    kern = _flat_stream_tns_kernel if tns else _flat_stream_kernel
    scratch = ([pltpu.VMEM((G, block_q), jnp.float32),
                pltpu.VMEM((gd, block_q), jnp.float32)] if tns else
               [pltpu.VMEM((block_q, G), jnp.float32),
                pltpu.VMEM((block_q, gd), jnp.float32)])

    def call(sub_shift):
        return pl.pallas_call(
            functools.partial(
                kern, n_pad_keys=nk_pad - Nk, dh=dh,
                heads_per_block=G, sub_shift=sub_shift,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, block_q, gd),
                             lambda b, i, j: (b // h2, i, b % h2)),
                pl.BlockSpec((1, block_k, gd),
                             lambda b, i, j: (b // h2, j, b % h2)),
                pl.BlockSpec((1, block_k, gd),
                             lambda b, i, j: (b // h2, j, b % h2)),
            ],
            out_specs=pl.BlockSpec((1, block_q, gd),
                                   lambda b, i, j: (b // h2, i, b % h2)),
            out_shape=jax.ShapeDtypeStruct((B, nq_pad, C), v.dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(smax, q, k, v)

    out = _dispatch_shift_variants(call, smax, _softmax_shift_mode())
    return out[:, :Nq]


def _flat_reference(q, k, v, *, num_heads):
    """Plain-XLA math of _flat_stream_kernel (CPU fallback + VJP recompute).
    q is pre-scaled by scale*log2(e): softmax(q.k / log2(e)) == the kernel's
    exp2-domain softmax."""
    B, _, C = q.shape
    h = num_heads
    dh = C // h
    split = lambda x: x.reshape(B, x.shape[1], h, dh).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q), split(k), split(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * jnp.float32(1.0 / _LOG2E), axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vh.dtype), vh)
    return o.transpose(0, 2, 1, 3).reshape(B, q.shape[1], C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flat(q, k, v, smax, num_heads, block_q, block_k):
    return _flat_forward(q, k, v, smax, num_heads=num_heads,
                         block_q=block_q, block_k=block_k)


def _flat_fwd(q, k, v, smax, num_heads, block_q, block_k):
    out = _flat_forward(q, k, v, smax, num_heads=num_heads,
                        block_q=block_q, block_k=block_k)
    return out, (q, k, v)


def _flat_bwd(num_heads, block_q, block_k, res, g):
    q, k, v = res
    f = lambda *a: _flat_reference(*a, num_heads=num_heads)
    out, vjp = jax.vjp(f, q, k, v)
    return vjp(g.astype(out.dtype)) + (jnp.zeros((1,), jnp.float32),)


_flat.defvjp(_flat_fwd, _flat_bwd)


def flat_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    num_heads: int,
    static_max: float | jax.Array,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
) -> jax.Array:
    """Streaming flash attention on flat (B, N, C) prepped q/k/v.

    The large-N (> _FUSED_MAX_TOKENS) TPU self-attention path: the caller
    has already applied per-head LN + RoPE in the flat layout, so this
    kernel only streams — no relayout on either side, no prep recompute
    per q block. Requires a bounded-logit shift (qk-norm attention).
    """
    C = q.shape[-1]
    dh = C // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(dh)
    if block_q is None:
        block_q = int(os.environ.get("VITSLAM_FLAT_BQ", 1024))
    if block_k is None:
        block_k = int(os.environ.get("VITSLAM_FLAT_BK", 1024))
    q = (q.astype(jnp.float32) * jnp.float32(scale * _LOG2E)).astype(
        jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    smax = jnp.asarray(static_max, jnp.float32).reshape(1) * jnp.float32(
        _LOG2E)
    smax = jax.lax.stop_gradient(smax)
    return _flat(q, k, v, smax, num_heads, block_q, block_k)


def fused_qkv_attention(
    qkv: jax.Array,
    *,
    num_heads: int,
    cos: jax.Array | None = None,
    sin: jax.Array | None = None,
    q_ln: tuple[jax.Array, jax.Array] | None = None,
    k_ln: tuple[jax.Array, jax.Array] | None = None,
    scale: float | None = None,
    static_max: float | jax.Array | None = None,
    nsplit: int = 2,
) -> jax.Array:
    """Self-attention straight from the packed qkv projection.

    qkv: (B, N, 3C) laid out [q | k | v]; cos/sin: per-head RoPE tables
    (B, N, dh) or head-tiled (B, N, C); q_ln/k_ln: per-head LayerNorm
    (scale, bias) each (dh,). Returns (B, N, C) in flat layout.
    """
    C = qkv.shape[-1] // 3
    dh = C // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(dh)
    do_rope = cos is not None
    do_ln = q_ln is not None
    if do_rope and cos.shape[-1] != dh:
        # head-tiled (B, N, C) caches: every head's values are identical,
        # and Mosaic needs the lane block to equal the array dim -> slice
        cos = cos[..., :dh]
        sin = sin[..., :dh]
    bounded = static_max is not None
    zero_dh = jnp.zeros((dh,), jnp.float32)
    qs, qb = (q_ln if do_ln else (zero_dh, zero_dh))
    ks, kb_ = (k_ln if do_ln else (zero_dh, zero_dh))
    if not do_rope:
        cos = sin = jnp.zeros((qkv.shape[0], qkv.shape[1], dh), jnp.float32)
    smax = jnp.asarray(static_max if bounded else 0.0, jnp.float32)
    smax = jax.lax.stop_gradient(smax.reshape(1) * jnp.float32(_LOG2E))
    return _fused(qkv, cos, sin,
                  jnp.asarray(qs, jnp.float32), jnp.asarray(qb, jnp.float32),
                  jnp.asarray(ks, jnp.float32), jnp.asarray(kb_, jnp.float32),
                  smax, num_heads, float(scale), nsplit, do_ln, do_rope,
                  bounded)

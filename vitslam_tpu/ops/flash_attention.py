"""Fused flash attention for TPU, written in Pallas.

This is the framework's replacement for the reference's CUDA SDPA / flash
attention path (reference: aligned_vggt/layers/cross_attention.py:64-67 and
the VGGT backbone internals — SURVEY.md §2.9(b)). It implements the
online-softmax streaming algorithm with the K/V loop as the innermost
*sequential* grid dimension (TPU grid steps run in order, so VMEM scratch
accumulators persist across K blocks).

Design notes (see /opt/skills/guides/pallas_guide.md):
  * Q/K/V blocks live in VMEM; accumulation in fp32 scratch.
  * logits are computed on the MXU via jnp.dot with
    preferred_element_type=float32; inputs may be bf16.
  * the kernel is VPU-bound at head dim 64 (the exp over N_q x N_k logits
    costs more vector time than the two matmuls cost MXU time), so the
    formulation is deliberately VPU-frugal:
      - softmax runs in the exp2 domain: log2(e) is folded into the q
        scaling, so each logit costs one subtract + one hardware exp2
        (plain `exp` hides an extra per-element multiply);
      - row sums ride the MXU: when the value head dim has lane-padding
        slack (dv % 128 != 0 — e.g. 64), v is augmented with a ones column
        so p @ [v | 1] yields the accumulator AND the softmax denominator
        in one matmul, deleting the per-tile VPU reduction. Zero-padded
        K rows have 0 in the ones column, so padding contributes no mass
        and needs no mask or correction term.
  * ragged sequence lengths are handled by padding + masking the tail
    K block (static shapes — no recompilation across chunk sizes); in the
    MXU-sum formulation the mask is only needed for the online-max path's
    max-tracking hygiene, not for correctness of the mass.
  * backward pass: custom VJP that recomputes attention with plain XLA ops
    (exact, memory-fine at this model's trainable-path sizes: the
    AlignmentHead attends over ~1.4k tokens; the 27k-token global attention
    of the frozen backbone never needs gradients).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tuned on TPU v5e at the flagship's global-attention shape (16 heads,
# ~6.9k tokens, head dim 64): 1024/1024 reaches ~42 TF/s vs ~27 at 256/512
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30
_LOG2E = 1.4426950408889634  # log2(e): folded into q so exp becomes exp2


def _row_max(s):
    """Row max of a (bq, bk) tile, VPU-frugally: a cross-lane reduction
    costs ~log2(128) shuffle passes over the FULL tile, so first collapse
    groups of 128 lanes with strided elementwise maxima (one pass), then
    lane-reduce only the (bq, 128) remainder."""
    bq, bk = s.shape
    if bk > 128 and bk % 128 == 0:
        s = jnp.max(s.reshape(bq, bk // 128, 128), axis=1)
    return jnp.max(s, axis=-1, keepdims=True)


# no-sub safety envelope, log2 domain: l accumulates up to Nk * 2^smax and
# must stay < 2^127 (fp32/bf16 exponent range); Nk <= ~128k = 2^17 leaves
# headroom at 100
_NOSUB_SAFE_LOG2 = 100.0


def _softmax_shift_mode() -> str:
    """How bounded-logit kernels treat the static softmax shift.

    The shift cancels exactly in out = acc/l (and lse = log2(l) already
    carries it: l_nosub = l_sub * 2^shift), so the per-logit subtraction
    is pure overflow protection; skipping it removes one VPU pass per
    logit from the softmax's three (sub, exp2, cast). exp2(s) with
    |s| <= smax stays finite whenever smax < ~127 - log2(Nk) in the log2
    domain (~80 nats) — true for every O(1)-gain qk-norm in practice, but
    not provable at trace time (the bound is computed from the learned
    gains at runtime, nn/layers.py::_qk_shift).

    MEASURED (v5e, scripts/softmax_sub_probe.py, flagship aggregator
    B=4 518x518): sub 920.5 ms, nosub 922.1 ms (+0.2%, noise), auto
    967.8 ms (+5.1% — the lax.cond dispatch itself costs real time).
    Mosaic evidently hides the subtract inside the exp2 pipeline, so the
    saved VPU pass buys nothing on-chip. DEFAULT = sub (the round-2
    measured state); nosub stays as an opt-in for experiments; auto's
    cond dispatch is kept for API compatibility but never worth it.

    VITSLAM_SOFTMAX_SUB = 1/sub (default): always subtract | 0/nosub:
    always skip (caller guarantees the bound) | auto: a lax.cond on the
    traced shift picks no-sub when smax < _NOSUB_SAFE_LOG2 (both
    variants compile; the branch is one scalar compare at dispatch)."""
    env = os.environ.get("VITSLAM_SOFTMAX_SUB", "sub")
    if env in ("1", "sub"):
        return "sub"
    if env in ("0", "nosub"):
        return "nosub"
    return "auto"


def _dispatch_shift_variants(call, smax, mode: str):
    """call(sub_shift: bool) -> out; picks the variant per _softmax_shift
    _mode, branching at runtime on the log2-domain shift scalar in auto
    mode. Pallas custom-calls are not speculatable, so XLA keeps the cond
    a real branch (never a compute-both select)."""
    if mode == "sub":
        return call(True)
    if mode == "nosub":
        return call(False)
    return jax.lax.cond(smax[0] < _NOSUB_SAFE_LOG2,
                        lambda: call(False), lambda: call(True))


def _flash_kernel(
    smax_ref, q_ref, k_ref, v_ref, o_ref, *refs,
    kv_len: int, block_k: int, needs_mask: bool, bounded: bool,
    mxu_sum: bool, dv: int, single_k: bool, with_lse: bool,
    sub_shift: bool = True,
):
    """One (batch*head, q_block, k_block) grid step of flash attention.

    All exponentials are exp2 (the caller pre-scales q by scale*log2e and
    smax by log2e). With mxu_sum, v carries a trailing ones column and
    acc_scratch holds [acc | l]; l_scratch is unused. With with_lse the
    log2-domain row logsumexp is emitted as a second output (the backward
    kernels' softmax residual)."""
    if with_lse:
        lse_ref, m_scratch, l_scratch, acc_scratch = refs
    else:
        lse_ref, (m_scratch, l_scratch, acc_scratch) = None, refs
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)

    q = q_ref[0]  # (block_q, d) — pre-scaled by log2(e)/sqrt(d)
    k = k_ref[0]  # (block_k, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k) — log2-domain logits

    if single_k and mxu_sum:
        # whole KV fits one block: no streaming state at all — the scratch
        # accumulators (and their per-step init/finalize round trips, which
        # dominate at ~1.4k-token frame/patch-embed shapes) vanish.
        if bounded:
            # shift cancels in pv/l and lse (_softmax_shift_mode) — the
            # no-sub default drops one VPU pass per logit
            shift = smax_ref[0] if sub_shift else jnp.float32(0.0)
            p = jnp.exp2(s - shift) if sub_shift else jnp.exp2(s)
        else:
            # no pad mask needed: padded K rows are zero -> s = 0 there, which
            # only lifts the row max (softmax is shift-invariant, so the
            # result is exact); their mass never lands (v rows and the ones
            # column are both zero).
            shift = _row_max(s)
            p = jnp.exp2(s - shift)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l = pv[:, dv:dv + 1]
        o_ref[0] = (pv[:, :dv] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        if with_lse:
            lse_ref[0] = shift + jnp.log2(jnp.maximum(l, 1e-30))
        return

    @pl.when(kb == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    if needs_mask and not bounded and not mxu_sum:
        # mask out K padding in the tail block — required only for the
        # l_scratch fallback (pad mass would pollute the VPU row sums). With
        # mxu_sum the padded rows' s = 0 merely lifts the running max
        # (shift-invariant -> exact) and their mass never lands, so the
        # iota/select VPU pass is skipped. NOTE: an in-kernel lax.cond on the
        # k program id benchmarked 2x SLOWER (it breaks Mosaic's elementwise
        # fusion).
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

    if not bounded:
        # online softmax: track the running row max (log2 domain)
        m_prev = m_scratch[:]  # (block_q, 1)
        m_cur = _row_max(s)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)  # (block_q, block_k)
        m_scratch[:] = m_next
        if not mxu_sum:
            l_scratch[:] = alpha * l_scratch[:] + jnp.sum(
                p, axis=-1, keepdims=True
            )
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[:] = acc_scratch[:] * alpha + pv
    else:
        # bounded-logit fast path (qk-normed attention: |s| <= |q||k|/sqrt(d)
        # is provably small): fixed shift, no max tracking, no rescale. The
        # shift is an SMEM scalar >= the provable logit bound (derived from
        # the learned qk-norm gains at the call site), so exp2 can never
        # overflow even when training drifts the gains or converted weights
        # are loaded.
        p = jnp.exp2(s - smax_ref[0]) if sub_shift else jnp.exp2(s)
        if not mxu_sum:
            l_scratch[:] = l_scratch[:] + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[:] = acc_scratch[:] + pv

    @pl.when(kb == nkb - 1)
    def _finalize():
        if mxu_sum:
            l = acc_scratch[:, dv:dv + 1]
            acc = acc_scratch[:, :dv]
        else:
            l = l_scratch[:]
            acc = acc_scratch[:]
            if bounded and needs_mask:
                # exact removal of the zero-padded keys' softmax mass
                # (each padded key contributes exp2(0 - shift), = 1 on the
                # no-sub path)
                n_pad = nkb * block_k - kv_len
                l = l - (n_pad * jnp.exp2(-smax_ref[0]) if sub_shift
                         else jnp.float32(n_pad))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        if with_lse:
            shift = ((smax_ref[0] if sub_shift else jnp.float32(0.0))
                     if bounded else m_scratch[:])
            lse_ref[0] = shift + jnp.log2(jnp.maximum(l, 1e-30))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(n: int, block: int) -> int:
    """Lane-aligned block minimizing padding waste: short sequences get a
    single tile (the per-tile grid/DMA overhead dominates at ~1.4k tokens);
    longer ones split into ceil(n/block) near-equal 128-aligned tiles (a
    fixed 1024 block would pad 1379 -> 2048, wasting ~48% of the compute)."""
    single = _round_up(n, 128)
    if single <= 2 * block:
        return single
    n_tiles = -(-n // block)
    return min(block, _round_up(-(-n // n_tiles), 128))


# whole-K single-tile policy: on v5e a 16-head 6870-token global attention
# measured 85-89 TF/s at (bq<=512, K=6912) vs 74 TF/s streaming 1024/1024 —
# the per-K-block scratch init/rescale/finalize traffic vanishes. block_q is
# capped by a VMEM model calibrated against the compiler's scoped-vmem
# accounting: the logit tile costs ~5 B/elem (fp32 s + bf16 p with partial
# reuse; bq=384 @ K=6912 measured 16.75 MB total = 13.2 MB logits + 3.6 MB
# of double-buffered K/V tiles) and must fit a 15 MB budget of the 16 MB
# scoped limit.
SINGLE_K_MAX = 8192
_VMEM_BUDGET = 15 * 1024 * 1024
_LOGIT_BYTES = 5


def _single_k_blocks(nq: int, nk: int, d: int, dv_in: int
                     ) -> tuple[int, int] | None:
    nk_pad = _round_up(nk, 128)
    if nk_pad > SINGLE_K_MAX:
        return None
    kv_bytes = 2 * 2 * nk_pad * (d + dv_in)  # double-buffered bf16 K/V tiles
    bq_cap = ((_VMEM_BUDGET - kv_bytes) // (_LOGIT_BYTES * nk_pad)) // 128 * 128
    if bq_cap < 128:
        return None
    return min(_round_up(nq, 128), bq_cap), nk_pad


def _flash_forward(q, k, v, smax, scale, block_q, block_k, bounded,
                   with_lse=False):
    """q: (BH, Nq, D), k/v: (BH, Nk, Dv), smax: (1,) fp32 -> (BH, Nq, Dv)
    [, lse (BH, Nq, 1) fp32 log2-domain when with_lse]."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    dv = v.shape[2]
    single = None
    if (block_q, block_k) == (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K):
        # explicit blocks = caller override; dv_in counts the ones column
        single = _single_k_blocks(nq, nk, d, dv + (1 if dv % 128 else 0))
    if single is not None:
        block_q, block_k = single
    else:
        block_q = _pick_block(nq, block_q)
        block_k = _pick_block(nk, block_k)
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_k)
    # MXU row sums are free exactly when the ones column fits in the value
    # tile's lane padding (dv not a lane multiple); otherwise it would add a
    # whole extra 128-lane group to the pv matmul.
    mxu_sum = (dv % 128) != 0
    # fold the softmax scale AND log2(e) into q: one pass over (nq, d)
    # instead of per-tile work over (block_q, block_k) logits
    q = q * jnp.asarray(scale * _LOG2E, q.dtype)
    smax = smax * jnp.float32(_LOG2E)
    if nq_pad != nq:
        q = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, 0)))
    if mxu_sum:
        v = jnp.concatenate(
            [v, jnp.ones((bh, nk, 1), v.dtype)], axis=-1
        )  # padded K rows get 0 here -> no pad mass in l
    if nk_pad != nk:
        k = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, 0)))
    dv_in = v.shape[2]

    grid = (bh, nq_pad // block_q, nk_pad // block_k)
    out_specs = pl.BlockSpec((1, block_q, dv), lambda b, i, j: (b, i, 0))
    out_shape = jax.ShapeDtypeStruct((bh, nq_pad, dv), q.dtype)
    if with_lse:
        out_specs = [out_specs,
                     pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((bh, nq_pad, 1), jnp.float32)]
    def call(sub_shift):
        return pl.pallas_call(
            functools.partial(
                _flash_kernel, kv_len=nk, block_k=block_k,
                needs_mask=(nk_pad != nk), bounded=bounded, mxu_sum=mxu_sum,
                dv=dv,
                single_k=(nk_pad // block_k == 1
                          and os.environ.get("VITSLAM_FLASH_SINGLE_K", "1")
                          == "1"),
                with_lse=with_lse, sub_shift=sub_shift,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, block_k, dv_in), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, dv_in), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(smax, q, k, v)

    if bounded:
        out = _dispatch_shift_variants(call, smax, _softmax_shift_mode())
    else:
        out = call(True)  # online-max path: sub_shift is never read
    if with_lse:
        return out[0][:, :nq], out[1][:, :nq]
    return out[:, :nq]


def _xla_attention(q, k, v, scale):
    """Reference XLA attention (used on CPU and as the VJP fallback path)."""
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)


# ---------------------------------------------------------------------------
# backward: streaming dq / dk+dv kernels (flash backward — O(N) memory, no
# (Nq x Nk) logit materialization, unlike the XLA recompute fallback).
# Residuals are (q, k, v, out, lse): D = rowsum(dout*out) and the saved
# log2-domain lse reconstruct each probability tile exactly, with no online
# max tracking in either kernel.
# ---------------------------------------------------------------------------

_BWD_BLOCK_Q = 512
_BWD_BLOCK_K = 512


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dmat_ref,
                         dq_ref, acc, *, kv_len: int, block_k: int,
                         needs_mask: bool, scale: float):
    """dq = scale * sum_k [p * (do v^T - D)] k, streaming over K blocks.
    q is pre-scaled by scale*log2e; lse is log2-domain."""
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk) log2 logits
    p = jnp.exp2(s - lse_ref[0])
    if needs_mask:
        # padded keys carry real probability-like mass here (nothing zeroes
        # them in the backward) -> mask the tail block
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        p = jnp.where(col < kv_len, p, 0.0)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dmat_ref[0])
    acc[:] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == nkb - 1)
    def _finalize():
        dq_ref[0] = (acc[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, do_ref, lse_ref, dmat_ref, k_ref, v_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float):
    """dv = sum_q p^T do;  dk = scale * sum_q [p * (do v^T - D)]^T q,
    streaming over Q blocks. Padded q rows have lse=+inf -> p = 0, so no
    query mask is needed; padded k rows produce dk/dv rows that the caller
    slices off."""
    qb = pl.program_id(2)
    nqb = pl.num_programs(2)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    p = jnp.exp2(s - lse_ref[0])
    do = do_ref[0]
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dmat_ref[0])
    # q is pre-scaled by scale*log2e; dividing by log2e leaves exactly scale
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qb == nqb - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[:] * (1.0 / _LOG2E)).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, scale):
    """Pallas flash backward. q/k/v/out/g: (BH, N*, D*); lse (BH, Nq, 1)."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    dv = v.shape[2]
    block_q = _pick_block(nq, _BWD_BLOCK_Q)
    block_k = _pick_block(nk, _BWD_BLOCK_K)
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_k)

    dmat = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1, keepdims=True)  # (BH, Nq, 1)
    qs = q * jnp.asarray(scale * _LOG2E, q.dtype)
    pad_q = nq_pad - nq
    pad_k = nk_pad - nk
    if pad_q:
        qs = jnp.pad(qs, ((0, 0), (0, pad_q), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad_q), (0, 0)))
        dmat = jnp.pad(dmat, ((0, 0), (0, pad_q), (0, 0)))
        # +inf lse zeroes padded queries' probabilities in the dkv kernel
        lse = jnp.pad(lse, ((0, 0), (0, pad_q), (0, 0)),
                      constant_values=jnp.float32(1e30))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, kv_len=nk, block_k=block_k,
                          needs_mask=bool(pad_k), scale=scale),
        grid=(bh, nq_pad // block_q, nk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, dv), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, dv), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qs, k, v, g, lse, dmat)

    dk, dvv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(bh, nk_pad // block_k, nq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, dv), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, dv), lambda b, j, i: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, dv), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, dv), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qs, g, lse, dmat, k, v)

    return dq[:, :nq], dk[:, :nk], dvv[:, :nk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, smax, scale, block_q, block_k, bounded):
    return _flash_forward(q, k, v, smax, scale, block_q, block_k, bounded)


def _flash_fwd(q, k, v, smax, scale, block_q, block_k, bounded):
    out, lse = _flash_forward(q, k, v, smax, scale, block_q, block_k, bounded,
                              with_lse=True)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, block_q, block_k, bounded, res, g):
    q, k, v, out, lse = res
    if os.environ.get("VITSLAM_FLASH_BWD", "kernel") == "xla":
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale), q, k, v)
        dq, dk, dv = vjp(g)
    else:
        dq, dk, dv = _flash_backward(q, k, v, out, lse, g, scale)
    return dq, dk, dv, jnp.zeros((1,), jnp.float32)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    static_max: float | jax.Array | None = None,
) -> jax.Array:
    """Flash attention over (B, H, N, D) tensors (self or cross: Nq != Nk ok).

    Differentiable (exact XLA recompute backward). Head dim D should be a
    multiple of 128 for peak MXU utilization but any D compiles (the lane
    dimension is D; 64 works with relayout cost).

    static_max: upper bound on |logits| enabling the bounded-logit fast path
    (no online max tracking). May be a traced scalar — e.g. derived from the
    learned qk-norm gains — so that trained/converted weights can never
    silently overflow the fixed shift.
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, d)
    bounded = static_max is not None
    smax = jnp.asarray(static_max if bounded else 0.0, jnp.float32).reshape(1)
    smax = jax.lax.stop_gradient(smax)
    out = _flash(qf, kf, vf, smax, float(scale), block_q, block_k, bounded)
    return out.reshape(b, h, nq, d)

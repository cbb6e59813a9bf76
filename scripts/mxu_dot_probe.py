#!/usr/bin/env python
"""Microbench: MXU utilization of the attention N^2 matmuls at dh=64.

Hypothesis (round 4): the 'speed-of-light' ~98 TF/s everyone measures for
the attention kernels is really the dh=64 penalty — the v5e MXU peak is
~197 TF/s bf16 (the MLP fusions measure 172 TF/s, BENCH.md), but

  * scores  S = Q K^T        contraction dim = dh = 64  -> 50% array load
  * values  O = P V          output lane dim = dh = 64  -> 50% lane use

The scores contraction is information-theoretically stuck at 64, but the
values matmul can be computed transposed, O^T = V^T P^T, with contraction
N_k (full) and output (dh, block_q) = (64, 512) — full lanes. This probe
times pallas kernels for each variant at the kernels' real block shapes.

Usage: python scripts/mxu_dot_probe.py [iters=50]
"""
from __future__ import annotations

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def fence(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))


def timeit(fn, *args, iters=50):
    out = fn(*args)
    fence(out)  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def _rep_kernel(a_ref, b_ref, o_ref, acc_ref, *, mode):
    # one matmul per grid step; accumulation defeats dead-code elimination
    # and grid steps can't be CSE'd away
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a = a_ref[...]
    b = b_ref[...]
    if mode == "std":            # (M,K)x(K,N): contraction K, out (M,N)
        acc_ref[...] += jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    elif mode == "tns":          # B^T A^T via dot_general: out (N,M)
        acc_ref[...] += jax.lax.dot_general(
            b, a, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _fin():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def bench_shape(M, K, N, mode, reps=None, iters=50):
    """Times `reps` (M,K)x(K,N) matmuls (one per grid step) per call.
    mode 'std': out (M,N).  mode 'tns': computes (N,M) = B^T A^T.
    reps defaults to ~200 GFLOP per pallas_call so the axon tunnel's
    ~1.5 ms per-call RPC latency is amortized below the noise (the first
    run of this probe used reps=32 and every shape measured 1.0-1.8 ms =
    pure dispatch latency)."""
    if reps is None:
        reps = max(64, int(2e11 // (2 * M * K * N)))
    a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
    oshape = (M, N) if mode == "std" else (N, M)
    f = pl.pallas_call(
        functools.partial(_rep_kernel, mode=mode),
        grid=(reps,),
        in_specs=[
            pl.BlockSpec((M, K), lambda r: (0, 0)),
            pl.BlockSpec((K, N), lambda r: (0, 0)),
        ],
        out_specs=pl.BlockSpec(oshape, lambda r: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM(oshape, jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    f = jax.jit(f)
    dt = timeit(f, a, b, iters=iters)
    tf = 2 * M * K * N * reps / dt / 1e12
    print(f"  ({M:5d},{K:5d})x({K:5d},{N:5d}) {mode}: "
          f"{dt*1e6:8.1f} us  {tf:6.1f} TF/s", flush=True)
    return tf


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print(f"devices: {jax.devices()}", flush=True)

    print("== control: big square matmuls (true MXU peak) ==")
    bench_shape(512, 1024, 1024, "std", iters=iters)
    bench_shape(1024, 1024, 1024, "std", iters=iters)

    print("== scores matmul S = Q K^T  (contraction dh=64) ==")
    # fused kernel frame shape: block_q=512, K rows 1536, dh=64
    bench_shape(512, 64, 1536, "std", iters=iters)
    bench_shape(512, 128, 1536, "std", iters=iters)  # dh=128 for contrast
    # flat streaming shape: block_q=512, block_k=1024
    bench_shape(512, 64, 1024, "std", iters=iters)

    print("== values matmul O = P V  (output lanes dh=64) ==")
    bench_shape(512, 1536, 64, "std", iters=iters)
    bench_shape(512, 1536, 128, "std", iters=iters)   # 2-head lane pack
    bench_shape(512, 1024, 64, "std", iters=iters)

    print("== values transposed O^T = V^T P^T (full lanes) ==")
    bench_shape(512, 1536, 64, "tns", iters=iters)
    bench_shape(512, 1024, 64, "tns", iters=iters)

    print("== scores transposed S^T = K Q^T ==")
    bench_shape(512, 64, 1536, "tns", iters=iters)


if __name__ == "__main__":
    main()

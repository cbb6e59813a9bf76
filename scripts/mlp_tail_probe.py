#!/usr/bin/env python
"""A/B probe for the fc2+residual+next-LN output fusion (VERDICT r2 #7).

The round-2 xplane breakdown pinned the square-518² gap on XLA's
fc2+residual+LN output fusions running at ~82 TF/s (vs ~180 for qkv/fc1).
This probe times, at the exact square-shape scan sizes:

  A. XLA:    y = LN(res + h @ w2 + b2)       (one jitted fn, both outputs)
  B. Pallas: ops.mlp_tail kernel              (matmul + epilogue in VMEM)

and prints TF/s for each. Run on the chip: python scripts/mlp_tail_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from vitslam_tpu.ops.mlp_tail import mlp_tail, mlp_tail_reference

    rng = jax.random.PRNGKey(0)
    C, F = 1024, 4096

    def timeit(f, args, iters=30):
        # chain iterations through res (same (M, C) shape as x') so the
        # loop is data-dependent and serial on-device; fence ONCE at the
        # end and subtract the single ~30 ms tunnel readback
        h, w2, b2, res = args[:4]
        rest = args[4:]
        out = f(h, w2, b2, res, *rest)
        x = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))
        t0 = time.time()
        for _ in range(iters):
            out = f(h, w2, b2, x, *rest)
            x = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))
        return max(time.time() - t0 - 0.030, 1e-9) / iters

    for M in (6895, 13790, 1379 * 16):
        ks = jax.random.split(rng, 6)
        h = jax.random.normal(ks[0], (M, F), jnp.bfloat16)
        w2 = jax.random.normal(ks[1], (F, C), jnp.bfloat16) * 0.02
        b2 = jax.random.normal(ks[2], (C,), jnp.float32) * 0.02
        res = jax.random.normal(ks[3], (M, C), jnp.bfloat16)
        gamma = jnp.ones((C,), jnp.float32)
        beta = jnp.zeros((C,), jnp.float32)
        flops = 2 * M * F * C

        for gelu in (False, True):
            tag = "gelu+" if gelu else "     "
            fa = jax.jit(lambda h, w2, b2, res, g, b, gelu=gelu:
                         mlp_tail_reference(h, w2, b2, res, g, b, gelu=gelu))
            dt = timeit(fa, (h, w2, b2, res, gamma, beta))
            print(f"M={M:6d} {tag}xla fused        {dt*1e3:7.2f} ms  "
                  f"{flops/dt/1e12:6.1f} TF/s", flush=True)

            # barrier variant: gelu materialized like production Mlp does
            if gelu:
                fbar = jax.jit(lambda h, w2, b2, res, g, b:
                               mlp_tail_reference(
                                   jax.lax.optimization_barrier(
                                       jax.nn.gelu(h.astype(jnp.float32),
                                                   approximate=False)
                                       .astype(h.dtype)),
                                   w2, b2, res, g, b))
                dt = timeit(fbar, (h, w2, b2, res, gamma, beta))
                print(f"M={M:6d} gelu+barrier xla      {dt*1e3:7.2f} ms  "
                      f"{flops/dt/1e12:6.1f} TF/s", flush=True)

            for bm in (256, 512, 1024):
                for bk in (512, 1024, 2048):
                    fb = jax.jit(lambda h, w2, b2, res, g, b, bm=bm, bk=bk,
                                 gelu=gelu:
                                 mlp_tail(h, w2, b2, res, g, b, gelu=gelu,
                                          block_m=bm, block_k=bk))
                    try:
                        dt = timeit(fb, (h, w2, b2, res, gamma, beta))
                        print(f"M={M:6d} {tag}pallas bm={bm:4d} bk={bk:4d} "
                              f"{dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s",
                              flush=True)
                    except Exception as e:
                        print(f"M={M:6d} {tag}pallas bm={bm:4d} bk={bk:4d} "
                              f"FAIL {type(e).__name__}: {str(e)[:120]}",
                              flush=True)


if __name__ == "__main__":
    main()

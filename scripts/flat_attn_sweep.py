"""Sweep the large-N flat-layout streaming attention vs the transposed
flash path on the real chip (iteration tool for the 75/30 variants).

Shapes: the point/pose-aligned global attention at the reference's
518x154 eval setting (75 frames x 412 tokens = 30,900) and the square-518
stress shape (75 x 1374 = 103,050). 16 heads, head dim 64, bounded-logit
softmax (qk-norm backbone).

Usage: python scripts/flat_attn_sweep.py [n_tokens ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from vitslam_tpu.ops.flash_attention import flash_attention
    import vitslam_tpu.ops.fused_attention as fat

    rng = jax.random.PRNGKey(0)

    def fence(x):
        return float(jnp.sum(x.astype(jnp.float32).ravel()[:64]))

    def timeit(fn, args, iters=10):
        out = fn(*args)
        fence(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
            fence(out)
        return (time.time() - t0) / iters - 0.008

    h, dh = 16, 64
    C = h * dh
    ns = [int(a) for a in sys.argv[1:]] or [30900, 103050]
    smax = 24.0
    for n in ns:
        flops = 4 * h * n * n * dh
        qf = jax.random.normal(rng, (1, n, C), jnp.bfloat16)
        kf = jax.random.normal(rng, (1, n, C), jnp.bfloat16)
        vf = jax.random.normal(rng, (1, n, C), jnp.bfloat16)
        qt = qf.reshape(1, n, h, dh).swapaxes(1, 2)
        kt = kf.reshape(1, n, h, dh).swapaxes(1, 2)
        vt = vf.reshape(1, n, h, dh).swapaxes(1, 2)

        f0 = jax.jit(lambda q, k, v: flash_attention(q, k, v, static_max=smax))
        try:
            dt = timeit(f0, (qt, kt, vt))
            print(f"N={n} transposed-flash (current)      "
                  f"{dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"N={n} transposed-flash FAIL {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)

        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention as official,
            )
            fo = jax.jit(lambda q, k, v: official(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), sm_scale=1.0 / dh ** 0.5))
            dt = timeit(fo, (qt, kt, vt))
            print(f"N={n} official-pallas-flash           "
                  f"{dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"N={n} official-pallas-flash FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)

        for bq, bk, inner in [(1024, 1024, 0), (1024, 4096, 512),
                              (1024, 2048, 512), (2048, 2048, 512),
                              (4096, 512, 0), (3072, 1024, 0),
                              (1024, 4096, 1024), (512, 8192, 512)]:
            os.environ["VITSLAM_FLAT_INNER_K"] = str(inner)
            f1 = jax.jit(lambda q, k, v, bq=bq, bk=bk: fat.flat_flash_attention(
                q, k, v, num_heads=h, static_max=smax, block_q=bq, block_k=bk))
            try:
                dt = timeit(f1, (qf, kf, vf))
                print(f"N={n} flat bq={bq:5d} bk={bk:5d} ik={inner:4d}  "
                      f"{dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s",
                      flush=True)
            except Exception as e:
                print(f"N={n} flat bq={bq:5d} bk={bk:5d} ik={inner:4d}  FAIL "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)
        os.environ["VITSLAM_FLAT_INNER_K"] = "0"


if __name__ == "__main__":
    main()

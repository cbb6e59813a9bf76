"""Sweep flash-attention block configs on the real chip (iteration tool).

Probes the flagship's two hot attention shapes (global 6870, frame 1374)
across (block_q, block_k, single_k) to find the fastest tiling. The 1408^2
fp32 logit tile of the whole-sequence frame path is ~7.9 MB — two of those
(s and p) squeeze the 16 MB VMEM, so smaller q blocks may win.

Usage: python scripts/flash_sweep.py
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

    rng = jax.random.PRNGKey(0)

    def fence(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    def timeit(fn, *args, iters=20):
        out = fn(*args)
        fence(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(out, *args[1:])
        fence(out)
        return (time.time() - t0 - 0.030) / iters

    shapes = {
        "frame": (5 * 16, 1374, 64),
        "global": (16, 6870, 64),
    }
    configs = [
        # (block_q, block_k, single_k)
        (1024, 1024, True),   # current default
        (1024, 1024, False),
        (512, 1024, True),
        (512, 2048, True),    # small q, whole-K-ish
        (256, 2048, True),
        (256, 1024, True),
        (512, 512, False),
        (768, 1536, True),
    ]
    for name, (bh, n, d) in shapes.items():
        q = jax.random.normal(rng, (1, bh, n, d), jnp.bfloat16)
        k = jax.random.normal(rng, (1, bh, n, d), jnp.bfloat16)
        v = jax.random.normal(rng, (1, bh, n, d), jnp.bfloat16)
        for bq, bk, sk in configs:
            os.environ["VITSLAM_FLASH_SINGLE_K"] = "1" if sk else "0"
            # env var is read at trace time inside _flash_forward
            import importlib
            fa = importlib.import_module("vitslam_tpu.ops.flash_attention")
            f = jax.jit(lambda q, k, v, bq=bq, bk=bk: fa.flash_attention(
                q, k, v, static_max=24.0, block_q=bq, block_k=bk))
            try:
                dt = timeit(f, q, k, v)
                tf = 4 * bh * n * n * d / dt / 1e12
                print(f"{name:7s} bq={bq:5d} bk={bk:5d} single_k={int(sk)}  "
                      f"{dt*1e3:8.3f} ms  {tf:6.2f} TF/s", flush=True)
            except Exception as e:
                print(f"{name:7s} bq={bq:5d} bk={bk:5d} single_k={int(sk)}  "
                      f"FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()

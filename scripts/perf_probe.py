"""TPU micro-benchmarks for the hot kernels (iteration tool, not the bench).

Measures, on the real chip, the achieved TF/s of:
  * a big bf16 matmul (chip ceiling sanity),
  * the Pallas flash kernel at the flagship's global / frame / patch-embed
    attention shapes,
  * a transformer-block-shaped matmul chain (the "other matmuls" bucket).

All timings fence with a host readback (block_until_ready does not block on
the tunneled axon backend — CLAUDE.md).

Usage: python scripts/perf_probe.py [names...]   (default: all)
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

    rng = jax.random.PRNGKey(0)

    def fence(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    def timeit(fn, *args, iters=20):
        """fn(*args) -> array with args[0]'s shape/dtype. The tunnel's host
        readback costs ~30 ms, so chain `iters` dependent calls and fence
        ONCE, rather than fencing per call."""
        out = fn(*args)
        fence(out)  # compile + warm
        t0 = time.time()
        for _ in range(iters):
            out = fn(out, *args[1:])
        fence(out)
        dt = (time.time() - t0 - 0.030) / iters
        return dt, out

    results = {}
    want = set(sys.argv[1:])

    def sel(name):
        return not want or name in want

    if sel("matmul"):
        m = 8192
        a = jax.random.normal(rng, (m, m), jnp.bfloat16)
        b = jax.random.normal(rng, (m, m), jnp.bfloat16)
        f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        dt, _ = timeit(f, a, b)
        results["matmul8k"] = (dt, 2 * m**3 / dt / 1e12)

    def attn_probe(name, bh, nq, nk, d, bounded):
        q = jax.random.normal(rng, (1, bh, nq, d), jnp.bfloat16)
        k = jax.random.normal(rng, (1, bh, nk, d), jnp.bfloat16)
        v = jax.random.normal(rng, (1, bh, nk, d), jnp.bfloat16)
        sm = 24.0 if bounded else None
        f = jax.jit(lambda q, k, v: flash_attention(q, k, v, static_max=sm))
        dt, _ = timeit(f, q, k, v)
        results[name] = (dt, 4 * bh * nq * nk * d / dt / 1e12)

    if sel("global"):
        attn_probe("global_attn", 16, 6870, 6870, 64, True)
    if sel("frame"):
        attn_probe("frame_attn", 5 * 16, 1374, 1374, 64, True)
    if sel("embed"):
        attn_probe("embed_attn", 40 * 16, 1369, 1369, 64, False)

    if sel("mm"):
        # individual model-shaped matmuls: where does efficiency go?
        for nm, (m_, k_, n_) in {
            "mm_qkv": (6870, 1024, 3072), "mm_mlp1": (6870, 1024, 4096),
            "mm_mlp2": (6870, 4096, 1024), "mm_7k4k": (6912, 4096, 4096),
        }.items():
            a = jax.random.normal(rng, (m_, k_), jnp.bfloat16)
            b = jax.random.normal(rng, (k_, n_), jnp.bfloat16)
            f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)[:, :a.shape[1]])
            # note: slicing keeps the chain shape-stable only when n>=k
            f2 = jax.jit(lambda a, b: (jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)))
            dt = None
            if n_ >= k_:
                dt, _ = timeit(f, a, b)
            else:
                # chain via double matmul back to (m, k)
                c = jax.random.normal(rng, (n_, k_), jnp.bfloat16)
                g2 = jax.jit(lambda a, b, c: jnp.dot(jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16), c, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
                dt, _ = timeit(g2, a, b, c)
                dt /= 2.0
                results[nm] = (dt, 2 * m_ * k_ * n_ / dt / 1e12)
                continue
            results[nm] = (dt, 2 * m_ * k_ * n_ / dt / 1e12)

    if sel("temporal"):
        # AlignmentHead temporal attention: tiny sequence (S frames), huge
        # batch (one per patch token) — XLA path (below the flash cutoff)
        from vitslam_tpu.ops.attention import scaled_dot_product_attention as sdpa
        bp, h, s_, d = 6850, 16, 5, 64
        q = jax.random.normal(rng, (bp, h, s_, d), jnp.bfloat16)
        k = jax.random.normal(rng, (bp, h, s_, d), jnp.bfloat16)
        v = jax.random.normal(rng, (bp, h, s_, d), jnp.bfloat16)
        f = jax.jit(lambda q, k, v: sdpa(q, k, v, impl="xla"))
        dt, _ = timeit(f, q, k, v)
        results["temporal_attn"] = (dt, 4 * bp * h * s_ * s_ * d / dt / 1e12)

    if sel("dpt"):
        from vitslam_tpu.models.dpt_head import DPTHead
        head = DPTHead(dim_in=2048, output_dim=4)
        B, S, H, W = 1, 5, 518, 518
        toks = [jax.random.normal(rng, (B, S, 5 + 37 * 37, 2048), jnp.bfloat16)
                for _ in range(4)]
        imgs = jnp.zeros((B, S, 3, H, W), jnp.bfloat16)
        params = jax.jit(head.init, static_argnums=(3,))(rng, toks, imgs, 5)

        # chain on the first tap so iterations depend on each other
        def g(t0):
            out, _ = head.apply(params, [t0, toks[1], toks[2], toks[3]], imgs, 5)
            return t0 + 0 * out.mean()
        fg = jax.jit(g)
        dt, _ = timeit(fg, toks[0])
        results["dpt_head"] = (dt, float("nan"))

    if sel("block"):
        # transformer-block matmul chain at the global-attention token count
        n, c = 6870, 1024
        x = jax.random.normal(rng, (n, c), jnp.bfloat16)
        wqkv = jax.random.normal(rng, (c, 3 * c), jnp.bfloat16)
        wproj = jax.random.normal(rng, (c, c), jnp.bfloat16)
        w1 = jax.random.normal(rng, (c, 4 * c), jnp.bfloat16)
        w2 = jax.random.normal(rng, (4 * c, c), jnp.bfloat16)

        def chain(x, wqkv, wproj, w1, w2):
            d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            y = d(x, wqkv)
            y = d(y[:, :c], wproj)
            y = d(y, w1)
            y = jax.nn.gelu(y)
            y = d(y, w2)
            return y

        f = jax.jit(chain)
        dt, _ = timeit(f, x, wqkv, wproj, w1, w2)
        flops = 2 * n * c * (3 * c + c + 4 * c + 4 * c)
        results["block_chain"] = (dt, flops / dt / 1e12)

    print(f"# device={jax.devices()[0].device_kind}")
    for name, (dt, tf) in results.items():
        print(f"{name:14s} {dt*1e3:9.3f} ms   {tf:7.2f} TF/s")


if __name__ == "__main__":
    main()

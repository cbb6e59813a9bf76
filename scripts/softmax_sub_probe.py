#!/usr/bin/env python
"""A/B the bounded-softmax shift subtraction IN CONTEXT: time the
flagship aggregator encode with VITSLAM_SOFTMAX_SUB=1 (per-logit
`exp2(s - shift)`, round-2 behavior) vs 0 (`exp2(s)`, shift cancelled at
the acc/l division — one fewer VPU pass per logit).

The env var is read at trace time (ops/flash_attention.py::
_softmax_shift_mode), so one process traces all variants.
Usage: python scripts/softmax_sub_probe.py [B] [--aspect 1.0|0.3] [--trace]
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

    from vitslam_tpu.models.presets import flagship

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 4
    aspect = 1.0
    if "--aspect" in sys.argv:
        aspect = float(sys.argv[sys.argv.index("--aspect") + 1])
    do_trace = "--trace" in sys.argv
    width, W = 5, 518
    H = int(round(W * aspect / 14) * 14)
    model = flagship()
    rng = jax.random.PRNGKey(0)
    group = jax.random.uniform(rng, (B, width, 3, H, W), jnp.bfloat16)

    params = jax.jit(model.init, static_argnums=(2,))(rng, group[:1], 1)

    def fence(x):
        leaves = jax.tree_util.tree_leaves(x)
        return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))

    results, vals = {}, {}
    for mode in ("1", "0", "auto"):
        os.environ["VITSLAM_SOFTMAX_SUB"] = mode
        f = jax.jit(lambda p, im: jnp.sum(model.apply(
            p, im, method=lambda m, im: m.core.encode(im)
        )[0][-1].astype(jnp.float32)))
        t0 = time.time()
        out = f(params, group)
        vals[mode] = fence(out)
        print(f"sub={mode} compile+warm {time.time()-t0:6.1f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(6):
                fence(f(params, group))
            best = min(best, (time.time() - t0) / 6)
        results[mode] = best
        print(f"sub={mode} aggregator(B={B}, {H}x{W}) {best*1e3:9.1f} ms",
              flush=True)
        if do_trace:
            with jax.profiler.trace(f"/tmp/softmax_sub_{mode}"):
                fence(f(params, group))
                fence(f(params, group))
    base = results["1"]
    for mode, t in results.items():
        print(f"sub={mode} {t*1e3:9.1f} ms  ({t/base:5.3f}x of shifted)")
    print(f"fence sums: sub={vals['1']:.4f} nosub={vals['0']:.4f} "
          f"(loose check — bf16 softmax rounding differs slightly)")


if __name__ == "__main__":
    main()

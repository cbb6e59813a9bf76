#!/usr/bin/env python
"""A/B the fused block-tail kernel IN CONTEXT: time the flagship
aggregator encode at the square 518² shape with VITSLAM_MLP_TAIL
0 / mlp / proj / both, optionally dumping an xplane trace per variant.

_tail_sites() reads the env var at trace time, so one process traces all
variants. Usage: python scripts/tail_ab_probe.py [B] [--trace]
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    do_trace = "--trace" in sys.argv
    width, H = 5, 518
    model = flagship()
    rng = jax.random.PRNGKey(0)
    group = jax.random.uniform(rng, (B, width, 3, H, H), jnp.bfloat16)

    os.environ["VITSLAM_MLP_TAIL"] = "0"
    params = jax.jit(model.init, static_argnums=(2,))(rng, group[:1], 1)

    def fence(x):
        leaves = jax.tree_util.tree_leaves(x)
        return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))

    results = {}
    for mode in ("0", "mlp", "proj", "1"):
        os.environ["VITSLAM_MLP_TAIL"] = mode
        # fence via an in-jit reduction: slicing the tap stack to [..,:1,:1]
        # forces XLA to materialize it in a transposed 25.6x-padded layout
        # (16 GB OOM at compile time)
        f = jax.jit(lambda p, im: jnp.sum(model.apply(
            p, im, method=lambda m, im: m.core.encode(im)
        )[0][-1].astype(jnp.float32)))
        t0 = time.time()
        out = f(params, group)
        fence(out)
        print(f"mode={mode:4s} compile+warm {time.time()-t0:6.1f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(6):
                fence(f(params, group))
            best = min(best, (time.time() - t0) / 6)
        results[mode] = best
        print(f"mode={mode:4s} aggregator(B={B}) {best*1e3:9.1f} ms", flush=True)
        if do_trace:
            with jax.profiler.trace(f"/tmp/tail_ab_{mode}"):
                fence(f(params, group))
                fence(f(params, group))
    base = results["0"]
    for mode, t in results.items():
        print(f"{mode:4s} {t*1e3:9.1f} ms  ({t/base:5.3f}x of unfused)")


if __name__ == "__main__":
    main()

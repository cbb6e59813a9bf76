"""Per-stage timing of the LARGE-CHUNK (75/30) point/pose-aligned pipeline
on the real chip: full encode (aggregator + DPT + camera), aggregator
alone, and the align/merge stage — to direct the exact-path ≥30 FPS work
(VERDICT r3 Next #3: name where the 1.94 s/chunk goes).

Usage: python scripts/stage_probe_point.py [variant=point] [width=75]
           [overlap=30] [aspect=0.3] [encode_batch=1]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from vitslam_tpu.models.presets import (
        flagship_point_aligned, flagship_pose_aligned,
    )
    from vitslam_tpu.slam import ChunkedPipeline

    argv = sys.argv[1:]
    variant = argv[0] if len(argv) > 0 else "point"
    width = int(argv[1]) if len(argv) > 1 else 75
    overlap = int(argv[2]) if len(argv) > 2 else 30
    aspect = float(argv[3]) if len(argv) > 3 else 0.3
    B = int(argv[4]) if len(argv) > 4 else 1

    img = 518
    H = max(14, round(img * aspect / 14) * 14)
    W = img
    model = (flagship_point_aligned() if variant == "point"
             else flagship_pose_aligned())
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (1, width, 3, H, W), jnp.bfloat16)
    group = jnp.broadcast_to(images, (B,) + images.shape[1:])

    pipe = ChunkedPipeline(model, encode_batch=B)
    pipe.init_params(rng, images, overlap)
    params = pipe.params

    def fence(x):
        leaves = jax.tree_util.tree_leaves(x)
        return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))

    def timeit(name, fn, *args, iters=3):
        t0 = time.time()
        out = fn(*args)
        fence(out)
        print(f"{name:24s} compile+warm {time.time()-t0:6.1f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(iters):
                out = fn(*args)
                fence(out)
            best = min(best, (time.time() - t0) / iters)
        print(f"{name:24s} {best*1e3:9.1f} ms", flush=True)
        return best

    print(f"variant={variant} width={width} overlap={overlap} "
          f"{H}x{W} encode_batch={B}", flush=True)
    t_enc = timeit("encode_fn", lambda g: pipe._encode_fn(params, g), group)

    agg = jax.jit(lambda p, im: model.apply(
        p, im, method=lambda m, im: m.core.encode(im))[0][-1][..., :1, :1])
    t_agg = timeit("aggregator", lambda g: agg(params, g), group)

    raw1 = jax.tree_util.tree_map(
        lambda x: x[:1], pipe._encode_fn(params, group))
    shape = tuple(images.shape)
    outputs, state = pipe._align_fn(params, raw1, shape, overlap, None, None,
                                    False, None)
    fence(outputs)

    def align_once(st):
        out, st2 = pipe._align_fn(params, raw1, shape, overlap, st, None,
                                  False, None)
        return out, st2

    t0 = time.time()
    out, state = align_once(state)
    fence(out)
    print(f"{'align_fn':24s} compile+warm {time.time()-t0:6.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(3):
            out, state = align_once(state)
            fence(out)
        best = min(best, (time.time() - t0) / 3)
    print(f"{'align_fn':24s} {best*1e3:9.1f} ms", flush=True)

    fresh = width - overlap
    per_chunk = t_enc / B + best
    print(f"summary: encode {t_enc*1e3/B:.0f} ms/chunk "
          f"(aggregator {t_agg*1e3/B:.0f}, heads "
          f"{(t_enc - t_agg)*1e3/B:.0f}), align {best*1e3:.0f} ms/chunk "
          f"-> {fresh/per_chunk:.1f} FPS bound", flush=True)


if __name__ == "__main__":
    main()

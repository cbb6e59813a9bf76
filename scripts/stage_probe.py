"""Per-stage timing of the flagship inference pipeline on the real chip:
batched encode (aggregator / DPT heads / camera head separately) and the
sequential align stage. Iteration tool for finding the FPS bottleneck.

Usage: python scripts/stage_probe.py [encode_batch]
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
    from vitslam_tpu.slam import ChunkedPipeline

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    width, overlap, H = 5, 1, 518
    model = flagship()
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (1, width, 3, H, H), jnp.bfloat16)
    group = jax.random.uniform(rng, (B, width, 3, H, H), jnp.bfloat16)

    pipe = ChunkedPipeline(model, encode_batch=B)
    pipe.init_params(rng, images, overlap)
    params = pipe.params

    def fence(x):
        leaves = jax.tree_util.tree_leaves(x)
        return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))

    def timeit(name, fn, *args, iters=6):
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
        return out

    # full encode (aggregator + all heads), batched over B chunks
    timeit("encode_fn(B)", lambda g: pipe._encode_fn(params, g), group)

    # aggregator alone (returns taps; fence touches one leaf slice).
    # Materializing ALL taps with no consumer OOMs HBM at the square-518
    # shape beyond B~4, so this stage is allowed to fail independently.
    try:
        agg = jax.jit(lambda p, im: model.apply(
            p, im, method=lambda m, im: m.core.encode(im))[0][-1][..., :1, :1])
        timeit("aggregator(B)", lambda g: agg(params, g), group)
    except Exception as e:  # pragma: no cover - probe resilience
        print(f"{'aggregator(B)':24s} FAILED: {str(e)[:160]}", flush=True)

    # heads alone, on fixed taps from an encode. Holding the full tap
    # pyramid with no consumer is ~3.6 GB per chunk at square-518, so halve
    # the head batch until it fits and report per-B-chunk-normalized times.
    taps_fn = jax.jit(lambda p, im: model.apply(
        p, im, method=lambda m, im: m.core.encode(im)))
    Bh = B
    while True:
        try:
            taps, psi = taps_fn(params, group[:Bh])
            fence(taps)
            break
        except Exception as e:
            if Bh == 1:
                raise
            print(f"taps at B={Bh} failed ({str(e)[:80]}); halving", flush=True)
            Bh //= 2
    scale = B / Bh
    sfx = f"(x{scale:.0f})" if Bh != B else ""

    dpt = jax.jit(lambda p, taps, im: model.apply(
        p, taps, im, method=lambda m, t, im: m.core.decode_point(t, im, 5)))
    timeit(f"point_head({Bh}){sfx}", lambda: dpt(params, taps, group[:Bh]))
    dpt2 = jax.jit(lambda p, taps, im: model.apply(
        p, taps, im, method=lambda m, t, im: m.core.decode_depth(t, im, 5)))
    timeit(f"depth_head({Bh}){sfx}", lambda: dpt2(params, taps, group[:Bh]))
    cam = jax.jit(lambda p, taps: model.apply(
        p, taps, method=lambda m, t: m.core.decode_camera(t)))
    timeit(f"camera_head({Bh}){sfx}", lambda: cam(params, taps))

    # align stage: one chunk, sequential (state-carried)
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
    print(f"{'align_fn(1)':24s} compile+warm {time.time()-t0:6.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(6):
            out, state = align_once(state)
            fence(out)
        best = min(best, (time.time() - t0) / 6)
    print(f"{'align_fn(1)':24s} {best*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()

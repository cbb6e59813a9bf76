"""Benchmark: flagship FeatureAlignedVGGT chunked-inference throughput on
the real TPU chip.

Measures steady-state frames/sec of the chunk-and-align pipeline at the
reference's inference setting (chunk width 5, overlap 1, 518x518 — README
"up to 19 FPS" on a ~12GB GPU; BASELINE.md). Counts *new* frames per chunk
(width - overlap) since overlapping frames are recomputed by design.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_CHUNKS (timed chunks, default 8), BENCH_SMALL=1 (tiny
config smoke mode), BENCH_WIDTH / BENCH_OVERLAP.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compilation cache: the flagship backbone is large and the
# driver re-runs this file every round — cached executables cut minutes of
# recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

BASELINE_FPS = 19.0  # reference README.md:130 (feature-aligned, ~12GB GPU)


def main():
    import jax
    import jax.numpy as jnp

    from vitslam_tpu.models.presets import flagship
    from vitslam_tpu.slam import ChunkedPipeline

    small = os.environ.get("BENCH_SMALL", "0") == "1"
    width = int(os.environ.get("BENCH_WIDTH", 5))
    overlap = int(os.environ.get("BENCH_OVERLAP", 1))
    n_timed = int(os.environ.get("BENCH_CHUNKS", 8))

    if small:
        from vitslam_tpu.models.presets import small_feature_aligned
        model = small_feature_aligned()
        H = W = 224
    else:
        model = flagship()
        H = W = 518

    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (1, width, 3, H, W), jnp.bfloat16)

    pipe = ChunkedPipeline(model)
    t0 = time.time()
    pipe.init_params(rng, images, overlap)
    init_s = time.time() - t0

    # Force a host readback of a small reduction to delimit each step: on
    # the tunneled axon backend block_until_ready does not actually block,
    # so a device->host transfer is the only honest fence.
    def fence(outputs):
        return float(jnp.sum(outputs["pose_enc"]))

    # first-chunk trace + continuation trace (compile warmup)
    t0 = time.time()
    outputs, state = pipe.step(images, overlap, None)
    fence(outputs)
    outputs, state = pipe.step(images, overlap, state)
    fence(outputs)
    # one extra to flush any remaining async/compile backlog
    outputs, state = pipe.step(images, overlap, state)
    fence(outputs)
    compile_s = time.time() - t0

    # steady state: sequential chunk stream (state carried on device)
    t0 = time.time()
    for _ in range(n_timed):
        outputs, state = pipe.step(images, overlap, state)
        fence(outputs)
    elapsed = time.time() - t0

    new_frames = n_timed * (width - overlap)
    fps = new_frames / elapsed
    chunks_per_sec = n_timed / elapsed

    result = {
        "metric": "feature_aligned_inference_fps_chunk%d_ovl%d_%d" % (width, overlap, H),
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }
    print(json.dumps(result))
    print(
        f"# device={jax.devices()[0].device_kind} chunks/s={chunks_per_sec:.3f} "
        f"init={init_s:.1f}s compile={compile_s:.1f}s timed_chunks={n_timed}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

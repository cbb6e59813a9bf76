#!/usr/bin/env python
"""xplane-profile the chunk encode on the real chip and print the top ops.

Names where the per-chunk encode time actually goes (patch-embed scan vs
aggregator attention vs matmul fusions vs DPT/camera heads), to direct the
exact-path FPS work (VERDICT r3 Next #3/#4).

Usage: python scripts/profile_encode.py [variant=point] [width=75]
           [aspect=0.3] [encode_batch=1] [iters=2]

variant: point | pose | feature. Writes the trace under /tmp/enc_trace and
summarizes it via scripts/xplane_top.py's logic.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from vitslam_tpu.models.presets import (
        flagship, flagship_point_aligned, flagship_pose_aligned,
    )
    from vitslam_tpu.slam import ChunkedPipeline

    argv = sys.argv[1:]
    variant = argv[0] if len(argv) > 0 else "point"
    width = int(argv[1]) if len(argv) > 1 else 75
    aspect = float(argv[2]) if len(argv) > 2 else 0.3
    B = int(argv[3]) if len(argv) > 3 else 1
    iters = int(argv[4]) if len(argv) > 4 else 2

    H = max(14, round(518 * aspect / 14) * 14)
    model = {"point": flagship_point_aligned,
             "pose": flagship_pose_aligned,
             "feature": flagship}[variant]()
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (1, width, 3, H, 518), jnp.bfloat16)
    group = jnp.broadcast_to(images, (B,) + images.shape[1:])

    pipe = ChunkedPipeline(model, encode_batch=B)
    pipe.init_params(rng, images, 30 if width > 30 else 1)
    params = pipe.params

    def fence(x):
        leaves = jax.tree_util.tree_leaves(x)
        return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))

    t0 = time.time()
    out = pipe._encode_fn(params, group)
    fence(out)
    print(f"compile+warm {time.time()-t0:.1f}s", flush=True)

    trace_dir = "/tmp/enc_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = pipe._encode_fn(params, group)
            fence(out)
    print(f"trace written to {trace_dir} ({iters} iters, divide totals by "
          f"{iters})", flush=True)
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts", "xplane_top.py"),
                    trace_dir, "50"], check=False)


if __name__ == "__main__":
    main()

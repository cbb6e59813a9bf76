#!/usr/bin/env python
"""Flagship-scale TRAINING-step benchmark at the reference's train setting
(VERDICT r2 Next #6).

Times the full jitted frozen-backbone train step — 1.29B FeatureAlignedVGGT,
518x154 frames (fix_aspect_ratio 0.3), frozen "*aggregator*" /
"*camera_head*" / "*depth_head*" exactly as the reference's
train_featureAlignedVGGT_vkitti.yaml:115-137 — over (chunk_width, overlap)
buckets sampled from the reference's training ranges chunk_width [3,20] x
num_overlap [1,5] (same yaml:14-15; max_img_per_gpu 40). Each bucket runs
2 chunks per step (the minimum the reference's img_nums floor guarantees).

Also runs a short fixed-batch descent to confirm the objective falls at
flagship scale on the real chip.

Usage:  python scripts/train_bench.py [--steps N] [--buckets 3:1,10:3,20:5]
Prints one JSON line per bucket:
  {"bucket": "w3_o1", "sec_per_step": ..., "steps_per_sec": ...,
   "frames_per_step": ..., "frames_per_sec": ...}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--buckets", default="3:1,10:3,20:5")
    ap.add_argument("--descent-steps", type=int, default=6)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--profile", default=None,
                    help="dir: wrap 2 post-warmup steps of the first bucket "
                         "in jax.profiler.trace")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from vitslam_tpu.data.preprocess import get_target_shape
    from vitslam_tpu.models.presets import flagship
    from vitslam_tpu.slam import chunk_batch, generate_chunks, merge_chunk_outputs
    from vitslam_tpu.train import MultitaskLoss, build_optimizer
    from vitslam_tpu.train.optim import partition_params
    from vitslam_tpu.train.train_step import TrainState, make_train_step
    from vitslam_tpu.utils.testing import make_synthetic_batch

    H = int(get_target_shape(0.3, 518, 14)[0])  # 154
    W = 518

    # reference train yaml: loss weights :103-137, AdamW 5e-5/wd .05, clip 1.0
    loss = MultitaskLoss(
        cameraPose={"weight": 1.0, "warmup_percent": 0.02,
                    "warmup_type": "linear", "loss_type": "l1"},
        cameraPoseRel={"weight": 0.5, "warmup_start_percent": 0.02,
                       "warmup_percent": 0.02, "warmup_type": "linear",
                       "loss_type": "l1"},
        depth={"weight": 0.1, "warmup_start_percent": 0.02,
               "warmup_percent": 0.02, "warmup_type": "linear",
               "valid_range": 0.98},
        perFrameReg={"weight": 5.0, "warmup_start_percent": 0.01,
                     "warmup_percent": 0.01, "warmup_type": "linear"},
        perChunkReg={"weight": 5.0, "warmup_percent": 0.01,
                     "warmup_type": "linear"},
    )
    loss.setup_scheduling(70000)
    tx, _ = build_optimizer(max_lr=5e-5, min_lr=1e-8, total_steps=70000,
                            warmup_percent=0.05, weight_decay=0.05,
                            grad_clip_norm=1.0)
    freeze = ["*aggregator*", "*camera_head*", "*depth_head*"]

    # no remat: with the backbone frozen, XLA DCEs its backward pass and
    # keeps no backbone activations — remat would only add recompute
    model = flagship()
    rng = jax.random.PRNGKey(0)

    buckets = [tuple(int(x) for x in b.split(":"))
               for b in args.buckets.split(",")]
    params = None
    for width, overlap in buckets:
        n_chunks = 2
        n_frames = width + (width - overlap)  # 2 chunks
        batch = make_synthetic_batch(B=1, N=n_frames, H=H, W=W, seed=3)
        indices = generate_chunks(n_frames, "chunk_overlap", width, overlap)
        chunks = tuple(
            {k: jnp.asarray(v) for k, v in c.items()}
            for c in chunk_batch(batch, indices)
        )
        merged = {
            k: jnp.asarray(v)
            for k, v in merge_chunk_outputs(
                [jax.tree_util.tree_map(np.asarray, c) for c in chunks], 0
            ).items()
        }
        if params is None:
            t0 = time.time()
            params = jax.jit(model.init, static_argnums=(2,))(
                rng, chunks[0]["images"], overlap
            )
            print(f"# init {time.time() - t0:.1f}s", file=sys.stderr)
            trainable, frozen = partition_params(params["params"], freeze)
            del params
            params = True
            state = TrainState(trainable=trainable, frozen=frozen,
                               opt_state=tx.init(trainable),
                               step=jnp.asarray(0, jnp.int32))
        else:
            # the previous bucket's donated step returned these buffers in
            # its new state — reuse them, fresh optimizer
            state = TrainState(trainable=state.trainable, frozen=state.frozen,
                               opt_state=tx.init(state.trainable),
                               step=jnp.asarray(0, jnp.int32))
        # donate: a second in-flight copy of the 5.2 GB fp32 param tree
        # does not fit 16 GB HBM next to the step's activations
        step_fn = make_train_step(model, loss, tx, overlap,
                                  "scale_from_depths", donate=True)

        def fence(m):
            return float(jnp.asarray(m["objective"], jnp.float32))

        t0 = time.time()
        state, metrics = step_fn(state, chunks, merged, jax.random.PRNGKey(1))
        fence(metrics)
        compile_s = time.time() - t0

        if args.profile:
            with jax.profiler.trace(args.profile):
                for i in range(2):
                    state, metrics = step_fn(state, chunks, merged,
                                             jax.random.fold_in(rng, 90 + i))
                    fence(metrics)
            print(f"# profile written to {args.profile}", file=sys.stderr)

        t0 = time.time()
        for i in range(args.steps):
            state, metrics = step_fn(state, chunks, merged,
                                     jax.random.fold_in(rng, i))
            fence(metrics)
        dt = (time.time() - t0) / args.steps
        print(json.dumps({
            "bucket": f"w{width}_o{overlap}",
            "sec_per_step": round(dt, 3),
            "steps_per_sec": round(1 / dt, 4),
            "frames_per_step": n_frames,
            "frames_per_sec": round(n_frames / dt, 2),
            "compile_s": round(compile_s, 1),
            "objective": round(float(metrics["objective"]), 4),
        }), flush=True)

        if (width, overlap) == buckets[-1] and args.descent_steps:
            # start past every loss-warmup schedule (cameraPose/depth/reg
            # weights ramp over the first ~1400 of 70000 steps — a rising
            # objective at step<1400 is the weights growing, not ascent)
            state = TrainState(trainable=state.trainable, frozen=state.frozen,
                               opt_state=state.opt_state,
                               step=jnp.asarray(7000, jnp.int32))
            state, metrics = step_fn(state, chunks, merged,
                                     jax.random.fold_in(rng, 999))
            objs = [round(fence(metrics), 4)]
            for i in range(args.descent_steps):
                state, metrics = step_fn(state, chunks, merged,
                                         jax.random.fold_in(rng, 1000 + i))
                objs.append(round(fence(metrics), 4))
            print(json.dumps({"descent_objectives": objs}), flush=True)


if __name__ == "__main__":
    main()

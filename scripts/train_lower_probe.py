#!/usr/bin/env python
"""Lower (no compile) the flagship train step with abstract args and report
what's in the jaxpr/StableHLO — used to diagnose the width-3 5.6 s/step
regression: is the frozen backbone's backward really DCE'd?

Prints: #scan/while ops, pallas/custom calls by name+count, text size,
and whether the backbone scan body appears more than once.
"""
from __future__ import annotations

import os
import re
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from vitslam_tpu.data.preprocess import get_target_shape
from vitslam_tpu.models.presets import flagship
from vitslam_tpu.train import MultitaskLoss, build_optimizer
from vitslam_tpu.train.optim import partition_params
from vitslam_tpu.train.train_step import TrainState, make_train_step
from vitslam_tpu.utils.testing import make_synthetic_batch
from vitslam_tpu.slam import chunk_batch, generate_chunks, merge_chunk_outputs

import numpy as np


def main():
    width, overlap = 3, 1
    H = int(get_target_shape(0.3, 518, 14)[0])
    W = 518
    loss = MultitaskLoss(
        cameraPose={"weight": 1.0, "warmup_percent": 0.02,
                    "warmup_type": "linear", "loss_type": "l1"},
        depth={"weight": 0.1, "warmup_start_percent": 0.02,
               "warmup_percent": 0.02, "warmup_type": "linear",
               "valid_range": 0.98},
    )
    loss.setup_scheduling(70000)
    tx, _ = build_optimizer()
    model = flagship()
    n_frames = width + (width - overlap)
    batch = make_synthetic_batch(B=1, N=n_frames, H=H, W=W, seed=3)
    indices = generate_chunks(n_frames, "chunk_overlap", width, overlap)
    chunks = tuple({k: np.asarray(v) for k, v in c.items()}
                   for c in chunk_batch(batch, indices))
    merged = merge_chunk_outputs([dict(c) for c in chunks], 0)

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    pshape = jax.eval_shape(lambda r: model.init(r, jnp.zeros_like(jnp.asarray(chunks[0]["images"])), overlap), rng)
    print(f"# eval_shape init {time.time()-t0:.1f}s", file=sys.stderr)
    abstract = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), pshape)
    trainable, frozen = partition_params(abstract["params"], ["*aggregator*", "*camera_head*", "*depth_head*"])
    n_train = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(trainable))
    n_frozen = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(frozen))
    print(f"trainable params: {n_train/1e6:.1f}M  frozen: {n_frozen/1e6:.1f}M")

    opt_shape = jax.eval_shape(tx.init, trainable)
    state = TrainState(
        trainable=trainable, frozen=frozen,
        opt_state=jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), opt_shape),
        step=jax.ShapeDtypeStruct((), jnp.int32),
    )
    step_fn = make_train_step(model, loss, tx, overlap, "scale_from_depths",
                              donate=True)
    abs_chunks = tuple(
        {k: jax.ShapeDtypeStruct(v.shape, jnp.float32) for k, v in c.items()}
        for c in chunks)
    abs_merged = {k: jax.ShapeDtypeStruct(np.asarray(v).shape, jnp.float32)
                  for k, v in merged.items()}
    t0 = time.time()
    lowered = step_fn.lower(state, abs_chunks, abs_merged, rng)
    print(f"# lower {time.time()-t0:.1f}s", file=sys.stderr)
    txt = lowered.as_text()
    print(f"stablehlo text: {len(txt)/1e6:.1f} MB")
    whiles = len(re.findall(r"stablehlo\.while", txt))
    print(f"while ops: {whiles}")
    calls = Counter(re.findall(r'tpu_custom_call[^"]*"[^"]*kernel_name[^"]*"', txt))
    names = Counter(re.findall(r'kernel_name\\?["\']?\s*[:=]\s*\\?["\']([A-Za-z0-9_]+)', txt))
    print("kernel names:", dict(names))
    # count big dot_generals by contracting dims involving 4096 (fc1/fc2 of
    # the 1024-dim backbone) vs alignment-head dims
    dots = re.findall(r"stablehlo\.dot_general.*?tensor<([0-9x]+)x(bf16|f32)>", txt)
    shapes = Counter(d[0] for d in dots)
    big = {s: c for s, c in shapes.items() if "4096" in s or "1024" in s}
    print("dot shapes with 1024/4096 dims:", dict(sorted(big.items(), key=lambda kv: -kv[1])[:20]))


if __name__ == "__main__":
    main()

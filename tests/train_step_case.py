"""Shared fixture for the 2-process training test: a deterministic tiny
train-step case that both the spawned workers (multiprocess_train_worker.py)
and the parent's single-process comparison run build identically, so
objectives can be compared across process topologies."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

B = 4          # one batch element per global device
N_FRAMES = 7
GATHER_ROWS = 3


def build_case():
    from vitslam_tpu.models import FeatureAlignedVGGT
    from vitslam_tpu.slam import chunk_batch, generate_chunks, merge_chunk_outputs
    from vitslam_tpu.train import MultitaskLoss, build_optimizer
    from vitslam_tpu.utils.testing import make_synthetic_batch, tiny_model_kwargs

    kw = tiny_model_kwargs(
        num_memory_tokens=4, align_embed_dim=32, align_dec_dim=16,
        num_heads=2,
    )
    model = FeatureAlignedVGGT(**kw)
    batch = make_synthetic_batch(B=B, N=N_FRAMES, H=28, W=42, seed=11)
    indices = generate_chunks(N_FRAMES, "chunk_overlap", 4, 1)
    chunks = chunk_batch(batch, indices)
    merged = merge_chunk_outputs(
        [jax.tree_util.tree_map(np.asarray, c) for c in chunks], 0)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["images"][:, :4]), 1)
    loss = MultitaskLoss(
        cameraPose={"weight": 1.0, "loss_type": "l1"},
        cameraPoseRel={"weight": 0.5, "loss_type": "l1"},
        depth={"weight": 0.1, "valid_range": 0.98},
        perFrameReg={"weight": 5.0},
        perChunkReg={"weight": 5.0},
        total_steps=100,
    )
    tx, _ = build_optimizer(max_lr=1e-4, total_steps=100)
    return model, params, loss, tx, chunks, merged


def run_steps(case, globalize, mesh, n_steps: int = 2, barrier=None):
    """Run ``n_steps`` of the full jitted train step with every batch leaf
    passed through ``globalize`` (identity for single-process; global-array
    construction over a process-spanning mesh for multiprocess).

    ``barrier``: cross-process rendezvous called AFTER the step is
    AOT-compiled and before the first execution. Gloo's communicator
    handshake has a hard 30 s KV-store deadline, and per-worker compile
    times can skew past it (notably when the persistent compile cache
    misses, e.g. after a host-CPU change) — precompiling then syncing
    makes both workers enter the first collective together."""
    from vitslam_tpu.train import (
        TrainState, make_train_step, partition_params,
    )

    model, params, loss, tx, chunks_host, merged_host = case
    params = jax.tree_util.tree_map(globalize, params)
    chunks = tuple(
        {k: globalize(v) for k, v in c.items()} for c in chunks_host)
    merged = {k: globalize(v) for k, v in merged_host.items()}

    freeze = ["*aggregator*", "*camera_head*", "*depth_head*"]
    trainable, frozen = partition_params(params["params"], freeze)
    state = TrainState(
        trainable=trainable, frozen=frozen, opt_state=tx.init(trainable),
        step=jnp.asarray(0),
    )
    step_fn = make_train_step(
        model, loss, tx, num_overlap=1,
        gt_alignment_type="scale_from_depths", donate=False,
    )
    if barrier is not None:
        step_fn.lower(state, chunks, merged, jax.random.PRNGKey(2)).compile()
        barrier()
    objectives = []
    for i in range(n_steps):
        state, metrics = step_fn(state, chunks, merged, jax.random.PRNGKey(2))
        objectives.append(float(np.asarray(metrics["objective"])))
    return objectives, state

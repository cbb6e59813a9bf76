"""Pod-topology dryrun worker: one rank of a 2-process jax.distributed gang.

Spawned by ``__graft_entry__.dryrun_multichip`` (and the multiprocess
tests) as ``python -m vitslam_tpu.parallel.pod_worker <pid> <port>
<n_local>``. Each process owns ``n_local`` virtual CPU devices; the global
mesh is ``(data=2, model=n_local)`` — data parallelism ACROSS processes
(DCN in a real pod) and tensor parallelism WITHIN a process (ICI), the
topology documented in docs/POD_TRAINING.md. Runs the full jitted train
step (chunk loop + multi-task loss + AdamW) with model-axis-sharded
parameters, so the cross-process gradient psum AND the intra-process
tensor-parallel collectives both execute for real.

Reference counterpart: multi-node DDP launch (training/run_model.py:472,
num_nodes > 1); here the mesh + pjit replace Lightning/NCCL.
"""
from __future__ import annotations

import os
import sys


def main() -> None:
    pid, port, n_local = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}")
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # NO persistent compile cache here: XLA:CPU AOT blobs are
    # machine-feature-specific, so a cache populated on one host makes
    # every load on another host fail with feature-mismatch noise
    # (MULTICHIP_r04 tail). The tiny model compiles fast enough cold.
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vitslam_tpu.models import FeatureAlignedVGGT
    from vitslam_tpu.parallel import make_mesh, sync_global_devices
    from vitslam_tpu.parallel.mesh import model_partition_spec
    from vitslam_tpu.slam import (
        chunk_batch, generate_chunks, merge_chunk_outputs,
    )
    from vitslam_tpu.train import (
        MultitaskLoss, TrainState, build_optimizer, make_train_step,
        partition_params,
    )
    from vitslam_tpu.utils.testing import (
        make_synthetic_batch, tiny_model_kwargs,
    )

    assert jax.process_count() == 2
    assert len(jax.devices()) == 2 * n_local
    # jax.devices() orders process 0's devices first, so reshape(2, n_local)
    # puts the data axis across processes and the model axis within one.
    mesh = make_mesh(n_data=2, n_model=n_local)
    sync_global_devices("pod-workers-up")

    def globalize(x, spec):
        """Build a global array from identical host data on every process —
        works regardless of whether the sharding spans processes."""
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    H, W = 28, 42
    kw = tiny_model_kwargs(
        num_memory_tokens=4, align_embed_dim=32, align_dec_dim=16,
        num_heads=2,
    )
    model = FeatureAlignedVGGT(**kw)

    B = 2  # one batch element per data shard
    batch = make_synthetic_batch(B=B, N=7, H=H, W=W, seed=11)
    indices = generate_chunks(7, "chunk_overlap", 4, 1)
    chunks_host = chunk_batch(batch, indices)
    merged_host = merge_chunk_outputs(
        [jax.tree_util.tree_map(np.asarray, c) for c in chunks_host], 0)

    params = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.asarray(batch["images"][:, :4]), 1)
    # tensor-parallel param layout: same specs the Trainer's
    # num_model_shards path assigns (parallel/mesh.py)
    params = jax.tree_util.tree_map(
        lambda x: globalize(x, model_partition_spec(x, n_local)), params)

    chunks = tuple(
        {k: globalize(v, P("data")) for k, v in c.items()}
        for c in chunks_host)
    merged = {k: globalize(v, P("data")) for k, v in merged_host.items()}

    freeze = ["*aggregator*", "*camera_head*", "*depth_head*"]
    trainable, frozen = partition_params(params["params"], freeze)
    loss = MultitaskLoss(
        cameraPose={"weight": 1.0, "loss_type": "l1"},
        cameraPoseRel={"weight": 0.5, "loss_type": "l1"},
        depth={"weight": 0.1, "valid_range": 0.98},
        perFrameReg={"weight": 5.0},
        perChunkReg={"weight": 5.0},
        total_steps=100,
    )
    tx, _ = build_optimizer(max_lr=1e-4, total_steps=100)
    state = TrainState(
        trainable=trainable, frozen=frozen, opt_state=tx.init(trainable),
        step=jnp.asarray(0),
    )
    step_fn = make_train_step(
        model, loss, tx, num_overlap=1,
        gt_alignment_type="scale_from_depths", donate=False,
    )
    # precompile, then rendezvous: Gloo's handshake has a hard 30 s
    # deadline that a cold-cache compile would blow through
    step_fn.lower(state, chunks, merged, jax.random.PRNGKey(1)).compile()
    sync_global_devices("pod-step-compiled")

    for i in range(2):
        state, metrics = step_fn(state, chunks, merged, jax.random.PRNGKey(1))
        obj = float(np.asarray(metrics["objective"]))
        assert np.isfinite(obj), f"non-finite objective {obj}"
        print(f"pod worker {pid}: step {i} objective {obj:.6f}", flush=True)

    sync_global_devices("pod-workers-done")
    print(f"pod worker {pid}: OK mesh=(2x{n_local})", flush=True)


if __name__ == "__main__":
    main()

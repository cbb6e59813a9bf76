"""Training-layer tests: loss formulas, warmup schedule, freezing, one full
train step (frozen backbone unchanged, trainable params move, loss finite),
and the data-parallel step over the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitslam_tpu.models import FeatureAlignedVGGT
from vitslam_tpu.slam import chunk_batch, generate_chunks, merge_chunk_outputs
from vitslam_tpu.train import (
    MultitaskLoss, TrainState, build_optimizer, compute_warmup_weight,
    freeze_mask, make_train_step, merge_params, partition_params,
)
from vitslam_tpu.utils.testing import make_synthetic_batch, tiny_model_kwargs

H, W = 28, 42
FREEZE = ["*aggregator*", "*camera_head*", "*depth_head*"]

LOSS_CFG = dict(
    cameraPose={"weight": 1.0, "loss_type": "l1"},
    cameraPoseRel={"weight": 0.5, "loss_type": "l1"},
    depth={"weight": 0.1, "valid_range": 0.98},
    perFrameReg={"weight": 5.0, "warmup_percent": 0.1,
                 "warmup_type": "linear"},
    perChunkReg={"weight": 5.0},
    total_steps=100,
)


class TestWarmup:
    def test_no_warmup_constant(self):
        w = compute_warmup_weight({"weight": 2.0}, 5, 100)
        assert float(w) == 2.0

    def test_linear_warmup(self):
        cfg = {"weight": 1.0, "warmup_percent": 0.5, "warmup_type": "linear"}
        assert float(compute_warmup_weight(cfg, 0, 100)) == 0.0
        np.testing.assert_allclose(float(compute_warmup_weight(cfg, 25, 100)), 0.5)
        assert float(compute_warmup_weight(cfg, 80, 100)) == 1.0

    def test_start_percent_gates(self):
        cfg = {"weight": 1.0, "warmup_percent": 0.2,
               "warmup_start_percent": 0.5, "warmup_type": "linear"}
        assert float(compute_warmup_weight(cfg, 10, 100)) == 0.0
        assert float(compute_warmup_weight(cfg, 60, 100)) == 0.5


class TestLossFormulas:
    def make_inputs(self):
        batch = make_synthetic_batch(B=1, N=4, H=H, W=W)
        from vitslam_tpu.geometry import extri_intri_to_pose_encoding
        pe = extri_intri_to_pose_encoding(
            jnp.asarray(batch["extrinsics"]), jnp.asarray(batch["intrinsics"]),
            (H, W),
        )
        preds = {
            "pose_enc": pe,
            "depth": jnp.asarray(batch["depths"])[..., None],
            "depth_conf": jnp.ones((1, 4, H, W)),
            "frame_se3_enc": jnp.asarray([[[0, 0, 0, 0, 0, 0, 1.0]] * 3]),
            "chunk_sim3_enc": jnp.asarray([[[0, 0, 0, 0, 0, 0, 1.0, 1.0]]]),
        }
        return preds, batch

    def test_perfect_prediction_near_zero(self):
        preds, batch = self.make_inputs()
        loss = MultitaskLoss(**LOSS_CFG)
        out = loss(preds, batch, 100, jax.random.PRNGKey(0))
        assert float(out["loss_camera"]) < 1e-4
        assert float(out["loss_depth"]) < 1e-4
        assert float(out["loss_per_frame_reg"]) < 1e-5
        assert float(out["loss_per_chunk_reg"]) < 1e-5
        assert float(out["objective"]) < 0.05  # rel-pose quat sign noise only

    def test_identity_regularizer_penalizes_offsets(self):
        preds, batch = self.make_inputs()
        preds["frame_se3_enc"] = jnp.asarray([[[1.0, 0, 0, 0, 0, 0, 1]] * 3])
        preds["chunk_sim3_enc"] = jnp.asarray([[[0, 0, 0, 0, 0, 0, 1.0, 2.0]]])
        loss = MultitaskLoss(**LOSS_CFG)
        out = loss(preds, batch, 100, jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(out["loss_per_frame_reg"]), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            float(out["loss_per_chunk_reg"]), np.log(2.0) ** 2, atol=1e-5
        )

    def test_depth_scale_error_positive(self):
        preds, batch = self.make_inputs()
        preds["depth"] = preds["depth"] * 2.0
        loss = MultitaskLoss(**LOSS_CFG)
        out = loss(preds, batch, 100, jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(out["loss_depth"]), np.log(2.0), rtol=0.05)


class TestFreezing:
    def test_partition_and_merge_roundtrip(self):
        params = {"params": {
            "core": {"aggregator": {"w": jnp.ones(3)},
                     "camera_head": {"w": jnp.ones(2)}},
            "alignment_head": {"w": jnp.zeros(4)},
        }}
        t, f = partition_params(params, FREEZE)
        flat_t = jax.tree_util.tree_leaves(t)
        assert len(flat_t) == 1  # only alignment head trains
        merged = merge_params(t, f)
        assert jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(params)

    def test_freeze_mask(self):
        params = {"core": {"aggregator": {"w": 1}}, "head": {"w": 2}}
        m = freeze_mask(params, ["*aggregator*"])
        assert m["core"]["aggregator"]["w"] is False
        assert m["head"]["w"] is True


@pytest.fixture(scope="module")
def train_setup():
    kw = tiny_model_kwargs(num_memory_tokens=4, align_embed_dim=32,
                           align_dec_dim=16)
    model = FeatureAlignedVGGT(**kw)
    batch = make_synthetic_batch(B=2, N=7, H=H, W=W)
    indices = generate_chunks(7, "chunk_overlap", 4, 1)
    chunks = tuple(
        {k: jnp.asarray(v) for k, v in c.items()}
        for c in chunk_batch(batch, indices)
    )
    merged = merge_chunk_outputs([jax.tree_util.tree_map(np.asarray, c) for c in chunks], 0)
    merged = {k: jnp.asarray(v) for k, v in merged.items()}
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["images"][:, :4]), 1
    )
    return model, params, chunks, merged


class TestTrainStep:
    def test_one_step(self, train_setup):
        model, params, chunks, merged = train_setup
        loss = MultitaskLoss(**LOSS_CFG)
        tx, _ = build_optimizer(max_lr=1e-3, total_steps=100)
        trainable, frozen = partition_params(params["params"], FREEZE)
        state = TrainState(trainable=trainable, frozen=frozen,
                           opt_state=tx.init(trainable),
                           step=jnp.asarray(0))
        step_fn = make_train_step(model, loss, tx, num_overlap=1,
                                  gt_alignment_type="scale_from_depths",
                                  donate=False)
        # two steps: the linear LR warmup starts at 0, so the first update
        # is a no-op by construction
        mid_state, metrics = step_fn(state, chunks, merged, jax.random.PRNGKey(1))
        new_state, metrics = step_fn(mid_state, chunks, merged, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["objective"]))
        assert float(metrics["grad_norm"]) > 0
        # trainable moved, frozen untouched
        moved = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.trainable,
            new_state.trainable,
        )
        assert max(jax.tree_util.tree_leaves(moved)) > 0
        same = jax.tree_util.tree_map(
            lambda a, b: bool((a == b).all()), state.frozen, new_state.frozen
        )
        assert all(jax.tree_util.tree_leaves(same))
        assert int(new_state.step) == 2

    def test_data_parallel_step(self, train_setup):
        from vitslam_tpu.parallel import make_mesh, shard_batch

        model, params, chunks, merged = train_setup
        mesh = make_mesh(n_data=2)
        loss = MultitaskLoss(**LOSS_CFG)
        tx, _ = build_optimizer(max_lr=1e-3, total_steps=100)
        trainable, frozen = partition_params(params["params"], FREEZE)
        state = TrainState(trainable=trainable, frozen=frozen,
                           opt_state=tx.init(trainable), step=jnp.asarray(0))
        step_fn = make_train_step(model, loss, tx, num_overlap=1,
                                  donate=False)
        sharded_chunks = tuple(shard_batch(c, mesh) for c in chunks)
        sharded_merged = shard_batch(merged, mesh)
        new_state, metrics = step_fn(
            state, sharded_chunks, sharded_merged, jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(metrics["objective"]))

    def test_model_axis_tensor_parallel_step(self, train_setup):
        """num_model_shards path (parallel/mesh.py::shard_params_model):
        2-D and scan-stacked 3-D kernels shard their out dim over 'model';
        the train step must run and match the unsharded objective."""
        from jax.sharding import PartitionSpec as P
        from vitslam_tpu.parallel import (
            make_mesh, shard_batch, shard_params_model,
        )

        model, params, chunks, merged = train_setup
        mesh = make_mesh(n_data=2, n_model=2)
        loss = MultitaskLoss(**LOSS_CFG)
        tx, _ = build_optimizer(max_lr=1e-3, total_steps=100)
        trainable, frozen = partition_params(params["params"], FREEZE)
        state = TrainState(trainable=trainable, frozen=frozen,
                           opt_state=tx.init(trainable), step=jnp.asarray(0))
        step_fn = make_train_step(model, loss, tx, num_overlap=1,
                                  gt_alignment_type="scale_from_depths",
                                  donate=False)
        _, ref_metrics = step_fn(state, chunks, merged, jax.random.PRNGKey(1))

        sharded = shard_params_model(state, mesh)
        # the big kernels actually sharded over 'model'
        specs = [x.sharding.spec for x in jax.tree_util.tree_leaves(
            sharded.frozen) if getattr(x, "ndim", 0) >= 2]
        assert any(sp and sp[-1] == "model" for sp in specs)
        new_state, metrics = step_fn(
            sharded, tuple(shard_batch(c, mesh) for c in chunks),
            shard_batch(merged, mesh), jax.random.PRNGKey(1),
        )
        np.testing.assert_allclose(float(metrics["objective"]),
                                   float(ref_metrics["objective"]),
                                   rtol=1e-5)

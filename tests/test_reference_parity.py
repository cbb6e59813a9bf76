"""Parity oracle: execute the reference's own math modules (torch-cpu via
the vggt shim in reference_shim.py) on fixed random inputs and assert this
repo's JAX implementations match to fp tolerance (VERDICT.md Next #3).

Unlike the unit tests (which verify re-derived formulas against closed-form
cases), these tests fail if any solver/loss/layer drifts from the *actual
reference code* at /root/reference.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_shim import import_reference

ref_align = import_reference("aligned_vggt.utils.alignment")
ref_geom = import_reference("aligned_vggt.utils.geometry")
ref_rope = import_reference("aligned_vggt.layers.rope")
ref_gated = import_reference("aligned_vggt.layers.gated_update")
ref_loss = import_reference("training.loss")

pytestmark = pytest.mark.quick


def _rng(seed):
    return np.random.default_rng(seed)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


class TestSolverParity:
    def test_umeyama(self):
        from vitslam_tpu.geometry.solvers import umeyama

        rng = _rng(0)
        x = rng.normal(size=(3, 40)).astype(np.float32)
        R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(R) < 0:
            R[:, -1] *= -1
        y = 1.7 * R @ x + np.array([[0.3], [-1.2], [2.0]]) \
            + 0.01 * rng.normal(size=(3, 40))
        r_ref, t_ref, s_ref = ref_align.umeyama(x, y)
        r_my, t_my, s_my = umeyama(jnp.asarray(x.T), jnp.asarray(y.T))
        np.testing.assert_allclose(np.asarray(r_my), r_ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_my), np.asarray(t_ref).ravel(),
                                   atol=1e-4)
        np.testing.assert_allclose(float(s_my), float(s_ref), rtol=1e-4)

    def test_method_of_horn(self):
        from vitslam_tpu.geometry.solvers import method_of_horn

        rng = _rng(1)
        model = rng.normal(size=(3, 30)).astype(np.float32)
        data = (2.0 * model + rng.normal(size=(3, 1)).astype(np.float32)
                + 0.05 * rng.normal(size=(3, 30)).astype(np.float32))
        for align_scale in (True, False):
            r_ref, t_ref, s_ref = ref_align.methodOfHorn(
                np.asarray(model, np.float64), np.asarray(data, np.float64),
                align_scale=align_scale)
            r_my, t_my, s_my = method_of_horn(
                jnp.asarray(model.T), jnp.asarray(data.T),
                align_scale=align_scale)
            np.testing.assert_allclose(np.asarray(r_my), r_ref, atol=1e-4)
            np.testing.assert_allclose(np.asarray(t_my), np.asarray(t_ref),
                                       atol=1e-4)
            np.testing.assert_allclose(float(s_my), float(s_ref), rtol=1e-4)

    def test_scale_lse_solver(self):
        from vitslam_tpu.geometry.solvers import scale_lse_solver

        rng = _rng(2)
        x = rng.normal(size=200).astype(np.float32)
        y = -0.8 * x + 0.1 * rng.normal(size=200).astype(np.float32)
        s_ref = ref_align.scale_lse_solver(x, y)
        s_my = float(scale_lse_solver(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(s_my, float(s_ref), rtol=1e-5)

    def test_scale_align_from_depths(self):
        # full weighted-median pipeline on a predictions dict
        from vitslam_tpu.slam.gt_alignment import scale_from_depths

        rng = _rng(3)
        B, S, H, W = 2, 3, 8, 11
        pred = {
            "depth": rng.uniform(0.5, 10, (B, S, H, W, 1)).astype(np.float32),
            "depth_conf": rng.uniform(0.1, 2, (B, S, H, W)).astype(np.float32),
            "world_points": rng.normal(size=(B, S, H, W, 3)).astype(np.float32),
            "pose_enc": rng.normal(size=(B, S, 9)).astype(np.float32),
        }
        batch = {
            "depths": rng.uniform(1, 20, (B, S, H, W)).astype(np.float32),
            "point_masks": (rng.uniform(size=(B, S, H, W)) > 0.2
                            ).astype(np.float32),
        }
        ref_pred = {k: _t(v).clone() for k, v in pred.items()}
        ref_align.scale_align_from_depths(
            ref_pred, {k: _t(v) for k, v in batch.items()})
        my_pred = scale_from_depths(
            {k: jnp.asarray(v) for k, v in pred.items()},
            {k: jnp.asarray(v) for k, v in batch.items()})
        np.testing.assert_allclose(
            np.asarray(my_pred["alignment_scales"]).ravel(),
            np.asarray(ref_pred["alignment_scales"]), rtol=1e-5)
        for key in ("depth", "world_points"):
            np.testing.assert_allclose(
                np.asarray(my_pred[key]), ref_pred[key].numpy(), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(my_pred["pose_enc"]), ref_pred["pose_enc"].numpy(),
            rtol=1e-5)


class TestGeometryParity:
    def test_average_pose_encodings(self):
        from vitslam_tpu.geometry import average_pose_encodings

        rng = _rng(4)
        pe = rng.normal(size=(3, 5, 7)).astype(np.float32)
        pe[..., 3:7] /= np.linalg.norm(pe[..., 3:7], axis=-1, keepdims=True)
        ref = ref_geom.averagePoseEncodings(_t(pe)).numpy()
        mine = np.asarray(average_pose_encodings(jnp.asarray(pe)))
        np.testing.assert_allclose(mine[..., :3], ref[..., :3], atol=1e-5)
        # eigenvector sign is arbitrary: compare up to quaternion sign
        q_ref, q_my = ref[..., 3:7], mine[..., 3:7]
        sign = np.sign(np.sum(q_ref * q_my, axis=-1, keepdims=True))
        np.testing.assert_allclose(q_my * sign, q_ref, atol=1e-5)

    def test_compute_relative_poses(self):
        from vitslam_tpu.geometry import compute_relative_poses

        rng = _rng(5)
        extr = self._random_extr(rng, B=2, S=6)
        for offset in (1, 2, 5):
            for to_next in (True, False):
                ref = ref_geom.compute_relative_poses(
                    _t(extr), offset, to_next).numpy()
                mine = np.asarray(compute_relative_poses(
                    jnp.asarray(extr), offset, to_next))
                np.testing.assert_allclose(mine, ref, atol=1e-5)

    @staticmethod
    def _random_extr(rng, B, S):
        extr = np.zeros((B, S, 3, 4), np.float32)
        for b in range(B):
            for s in range(S):
                q = rng.normal(size=4)
                q /= np.linalg.norm(q)
                x, y, z, w = q
                extr[b, s, :3, :3] = np.array([
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ])
                extr[b, s, :3, 3] = rng.normal(size=3)
        return extr

    def test_sim3_appliers(self):
        from vitslam_tpu.geometry import (
            apply_sim3_on_c2w, apply_sim3_on_point_maps, apply_sim3_on_w2c,
        )

        rng = _rng(6)
        B, S, H, W = 2, 4, 5, 6
        extr = self._random_extr(rng, B, S)
        transform = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        transform[:, :3, :] = self._random_extr(rng, B, 1)[:, 0]
        scales = rng.uniform(0.5, 2.0, B).astype(np.float32)
        pts = rng.normal(size=(B, S, H, W, 3)).astype(np.float32)

        ref_w2c = ref_align.apply_sim3_alignment_on_w2c(
            _t(extr), _t(transform), _t(scales)).numpy()
        my_w2c = np.asarray(apply_sim3_on_w2c(
            jnp.asarray(extr), jnp.asarray(transform), jnp.asarray(scales)))
        np.testing.assert_allclose(
            np.asarray(my_w2c)[..., :3, :], ref_w2c[..., :3, :], atol=1e-4)

        c2w = np.tile(np.eye(4, dtype=np.float32), (B, S, 1, 1))
        c2w[..., :3, :] = self._random_extr(rng, B, S)
        ref_c2w = ref_align.apply_sim3_alignment_on_c2w(
            _t(c2w).clone(), _t(transform), _t(scales)).numpy()
        my_c2w = np.asarray(apply_sim3_on_c2w(
            jnp.asarray(c2w), jnp.asarray(transform), jnp.asarray(scales)))
        np.testing.assert_allclose(my_c2w, ref_c2w, atol=1e-5)

        ref_pts = ref_align.apply_sim3_alignment_on_point_maps(
            _t(pts), _t(transform), _t(scales)).numpy()
        my_pts = np.asarray(apply_sim3_on_point_maps(
            jnp.asarray(pts), jnp.asarray(transform), jnp.asarray(scales)))
        np.testing.assert_allclose(my_pts, ref_pts, atol=1e-5)


class TestLayerParity:
    def test_rope_1d(self):
        from vitslam_tpu.nn import apply_rope_1d

        rng = _rng(7)
        x = rng.normal(size=(2, 3, 10, 32)).astype(np.float32)
        pos = rng.integers(0, 50, size=(2, 10))
        ref_mod = ref_rope.RotaryPositionEmbedding(frequency=100.0)
        ref = ref_mod(_t(x), torch.from_numpy(pos)).numpy()
        mine = np.asarray(apply_rope_1d(jnp.asarray(x), jnp.asarray(pos), 100.0))
        np.testing.assert_allclose(mine, ref, atol=1e-5)

    def test_gated_update(self):
        """Transplant the reference torch GatedUpdate's weights into this
        repo's stacked-einsum module and compare outputs."""
        from vitslam_tpu.nn import GatedUpdate

        rng = _rng(8)
        N, D, B = 4, 16, 2
        torch.manual_seed(0)
        ref_mod = ref_gated.GatedUpdate(token_dim=D, num_tokens=N,
                                        init_gate=0.5).eval()

        mem = rng.normal(size=(B, N, D)).astype(np.float32)
        mem /= np.linalg.norm(mem, axis=-1, keepdims=True)
        upd = rng.normal(size=(B, D)).astype(np.float32)
        with torch.no_grad():
            # the reference is called with the (B, 1, D) chunk token
            # (alignment_head.py:506); broadcasting matches (B, D) here
            ref_out = ref_mod(_t(mem), _t(upd[:, None])).numpy()

        my_mod = GatedUpdate(token_dim=D, num_tokens=N)
        params = my_mod.init(jax.random.PRNGKey(0), jnp.asarray(mem),
                             jnp.asarray(upd))
        sd = {k: v.detach().numpy() for k, v in ref_mod.state_dict().items()}
        p = dict(params["params"])
        p["delta_w1"] = jnp.stack(
            [sd[f"delta_mlps.{i}.0.weight"].T for i in range(N)])
        p["delta_b1"] = jnp.stack(
            [sd[f"delta_mlps.{i}.0.bias"] for i in range(N)])
        p["delta_w2"] = jnp.stack(
            [sd[f"delta_mlps.{i}.2.weight"].T for i in range(N)])
        p["delta_b2"] = jnp.stack(
            [sd[f"delta_mlps.{i}.2.bias"] for i in range(N)])
        p["gate_fc1"] = {"kernel": jnp.asarray(sd["gate_mlp.0.weight"].T),
                         "bias": jnp.asarray(sd["gate_mlp.0.bias"])}
        p["gate_fc2"] = {"kernel": jnp.asarray(sd["gate_mlp.2.weight"].T),
                         "bias": jnp.asarray(sd["gate_mlp.2.bias"])}
        my_out = np.asarray(my_mod.apply(
            {"params": p}, jnp.asarray(mem), jnp.asarray(upd)))
        np.testing.assert_allclose(my_out, ref_out, atol=1e-5)


def _loss_fixtures(seed, B=2, S=6, H=16, W=24):
    rng = _rng(seed)
    extr = TestGeometryParity._random_extr(rng, B, S)
    K = np.zeros((B, S, 3, 3), np.float32)
    K[:, :, 0, 0] = K[:, :, 1, 1] = 30.0
    K[:, :, 0, 2] = W / 2
    K[:, :, 1, 2] = H / 2
    K[:, :, 2, 2] = 1.0
    batch = {
        "images": rng.uniform(0, 1, (B, S, 3, H, W)).astype(np.float32),
        "extrinsics": extr,
        "intrinsics": K,
        "depths": rng.uniform(1, 20, (B, S, H, W)).astype(np.float32),
        "point_masks": (rng.uniform(size=(B, S, H, W)) > 0.1),
    }
    pe = rng.normal(size=(B, S, 9)).astype(np.float32)
    pe[..., 3:7] /= np.linalg.norm(pe[..., 3:7], axis=-1, keepdims=True)
    pred = {
        "pose_enc": pe,
        "depth": rng.uniform(0.5, 15, (B, S, H, W, 1)).astype(np.float32),
        "depth_conf": rng.uniform(0.1, 3, (B, S, H, W)).astype(np.float32),
        "frame_se3_enc": rng.normal(size=(B, S - 1, 7)).astype(np.float32),
        "chunk_sim3_enc": np.concatenate(
            [rng.normal(size=(B, 1, 7)),
             rng.uniform(0.5, 2.0, (B, 1, 1))], -1).astype(np.float32),
    }
    return pred, batch


def _torch_pred(pred):
    out = {
        "pose_enc": _t(pred["pose_enc"]),
        "depth": _t(pred["depth"]),
        "depth_conf": _t(pred["depth_conf"]),
        "frame_se3_alignment_enc": _t(pred["frame_se3_enc"]),
        "chunk_sim3_alignment_enc": _t(pred["chunk_sim3_enc"]),
    }
    return out


def _torch_batch(batch):
    return {k: (torch.from_numpy(np.asarray(batch[k]))
                if k != "point_masks" else
                torch.from_numpy(np.asarray(batch[k])).bool())
            for k in batch}


class TestLossParity:
    def test_camera_pose_loss(self):
        from vitslam_tpu.train.losses import camera_pose_loss

        pred, batch = _loss_fixtures(10)
        for lt in ("l1", "l2"):
            ref = ref_loss.compute_camera_pose_loss(
                _torch_pred(pred), _torch_batch(batch), loss_type=lt)
            mine = camera_pose_loss(pred, batch, loss_type=lt)
            for k in ("loss_camera", "loss_T", "loss_R"):
                np.testing.assert_allclose(
                    float(mine[k]), float(ref[k]), rtol=2e-5, atol=1e-6,
                    err_msg=f"{lt}/{k}")

    def test_relative_pose_loss(self):
        from vitslam_tpu.train.losses import relative_pose_loss

        pred, batch = _loss_fixtures(11)
        S = batch["extrinsics"].shape[1]
        fixed_offset = S // 2 + 1
        orig_randint = torch.randint

        def fixed_randint(*args, **kwargs):
            return torch.tensor([fixed_offset])

        torch.randint = fixed_randint
        try:
            for lt in ("l1", "l2"):
                for sa in (False, True):
                    ref = ref_loss.compute_relative_pose_loss(
                        _torch_pred(pred), _torch_batch(batch),
                        loss_type=lt, scale_agnostic=sa)
                    mine = relative_pose_loss(
                        pred, batch, jax.random.PRNGKey(0), loss_type=lt,
                        scale_agnostic=sa, large_offset=fixed_offset)
                    for k in ("loss_camera_rel", "loss_T_rel", "loss_R_rel"):
                        np.testing.assert_allclose(
                            float(mine[k]), float(ref[k]), rtol=5e-4,
                            atol=1e-5, err_msg=f"{lt}/sa={sa}/{k}")
        finally:
            torch.randint = orig_randint

    def test_depth_loss(self):
        from vitslam_tpu.train.losses import depth_loss

        # H*W*S*B > 1000 so the quantile filter actually engages
        pred, batch = _loss_fixtures(12, B=2, S=4, H=16, W=24)
        for vr in (-1, 0.98):
            ref = ref_loss.compute_depth_loss(
                _torch_pred(pred), _torch_batch(batch), valid_range=vr)
            mine = depth_loss(pred, batch, valid_range=vr)
            np.testing.assert_allclose(
                float(mine["loss_depth"]), float(ref["loss_depth"]),
                rtol=1e-4, err_msg=f"valid_range={vr}")

    def test_regularization_losses(self):
        from vitslam_tpu.train.losses import (
            per_chunk_regularization_loss, per_frame_regularization_loss,
        )

        pred, _ = _loss_fixtures(13)
        ref_f = ref_loss.per_frame_regularization_loss(_torch_pred(pred))
        my_f = per_frame_regularization_loss(pred)
        np.testing.assert_allclose(
            float(my_f["loss_per_frame_reg"]),
            float(ref_f["loss_per_frame_reg"]), rtol=1e-5)

        ref_c = ref_loss.per_chunk_regularization_loss(_torch_pred(pred))
        my_c = per_chunk_regularization_loss(pred)
        np.testing.assert_allclose(
            float(my_c["loss_per_chunk_reg"]),
            float(ref_c["loss_per_chunk_reg"]), rtol=1e-5)

    def test_multitask_loss_with_warmup(self):
        """Full MultitaskLoss objective incl. warmup schedules at several
        steps (linear warmup; the reference's exp path reads an attribute
        its own __init__ never sets)."""
        from vitslam_tpu.train.losses import MultitaskLoss

        pred, batch = _loss_fixtures(14)
        cfgs = dict(
            cameraPose={"weight": 1.0, "loss_type": "l1",
                        "warmup_percent": 0.2, "warmup_type": "linear"},
            depth={"weight": 0.1, "valid_range": -1,
                   "warmup_percent": 0.5, "warmup_start_percent": 0.1,
                   "warmup_start_weight": 0.01, "warmup_type": "linear"},
            perFrameReg={"weight": 5.0},
            perChunkReg={"weight": 5.0, "warmup_percent": 0.3,
                         "warmup_type": "linear"},
        )
        total_steps = 100
        ref_mod = ref_loss.MultitaskLoss(**{k: dict(v) for k, v in cfgs.items()})
        ref_mod.setupScheduling(total_steps)
        my_mod = MultitaskLoss(total_steps=total_steps,
                               **{k: dict(v) for k, v in cfgs.items()})
        for step in (0, 10, 35, 99):
            ref = ref_mod(_torch_pred(pred), _torch_batch(batch), step)
            mine = my_mod(pred, batch, step, jax.random.PRNGKey(0))
            np.testing.assert_allclose(
                float(mine["objective"]), float(ref["objective"]),
                rtol=1e-4, err_msg=f"step={step}")


class TestWarmupParity:
    def test_warmup_weight_schedule(self):
        from vitslam_tpu.train.losses import compute_warmup_weight

        ref_mod = ref_loss.MultitaskLoss()
        ref_mod.setupScheduling(1000)
        ref_mod.weight_warmup_exp = 2.0
        for cfg in (
            {"weight": 1.0},
            {"weight": 2.0, "warmup_percent": 0.2, "warmup_type": "linear"},
            {"weight": 2.0, "warmup_percent": 0.2, "warmup_type": "exp"},
            {"weight": 1.5, "warmup_percent": 0.3, "warmup_start_percent": 0.2,
             "warmup_start_weight": 0.1, "warmup_type": "linear"},
        ):
            for step in (0, 100, 250, 400, 999):
                ref_w = ref_mod.compute_warmup_weight(cfg, step)
                my_w = float(compute_warmup_weight(cfg, step, 1000))
                np.testing.assert_allclose(my_w, float(ref_w), rtol=1e-6,
                                           err_msg=f"{cfg}/{step}")

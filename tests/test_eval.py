"""Tests for eval: kNN exactness, ICP recovery of a known transform, metric
formulas against hand-computed values, subsample search."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitslam_tpu.eval import (
    AbsoluteTrajectoryError, ChamferDistanceMetrics, RelativePoseError,
    ScaleConsistency, find_subsample_factor, iterative_closest_point,
    prepare_data_for_metrics,
)
from vitslam_tpu.ops.knn import nn_search
from vitslam_tpu.utils.testing import make_synthetic_batch


def random_rotation(rng):
    from vitslam_tpu.geometry import quat_to_mat
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(quat_to_mat(jnp.asarray(q, jnp.float32)))


class TestKNN:
    def test_exact_vs_bruteforce(self):
        rng = np.random.default_rng(0)
        p = rng.normal(size=(137, 3)).astype(np.float32)
        q = rng.normal(size=(251, 3)).astype(np.float32)
        d, i = nn_search(jnp.asarray(p), jnp.asarray(q), tile_p=64, tile_q=64)
        full = ((p[:, None] - q[None]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d), full.min(axis=1), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), full.argmin(axis=1))

    def test_l1_norm(self):
        p = jnp.asarray([[0.0, 0, 0]])
        q = jnp.asarray([[1.0, 1, 1], [0.1, 0, 0]])
        d, i = nn_search(p, q, norm=1)
        assert int(i[0]) == 1
        np.testing.assert_allclose(float(d[0]), 0.1, atol=1e-6)


class TestICP:
    def test_recovers_rigid_transform(self):
        # small perturbation: ICP (like any local NN-based method) converges
        # from identity init only within the basin of attraction
        rng = np.random.default_rng(1)
        src = rng.normal(size=(400, 3)).astype(np.float32)
        a = 0.15
        R = np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
            np.float32,
        )
        t = np.array([0.05, -0.03, 0.04], np.float32)
        dst = src @ R.T + t
        res = iterative_closest_point(jnp.asarray(src), jnp.asarray(dst),
                                      iterations=20)
        np.testing.assert_allclose(np.asarray(res.transformed), dst, atol=1e-3)
        assert float(res.rmse) < 1e-3

    def test_scale_estimation(self):
        # grid cloud with spacing >> scale perturbation so identity-init NN
        # correspondences are already correct
        g = np.arange(6, dtype=np.float32)
        src = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
        dst = 1.05 * src
        res = iterative_closest_point(jnp.asarray(src), jnp.asarray(dst),
                                      iterations=10, estimate_scale=True)
        np.testing.assert_allclose(float(res.s), 1.05, atol=1e-3)

    def test_weights_mask_padding(self):
        rng = np.random.default_rng(3)
        src = rng.normal(size=(100, 3)).astype(np.float32)
        pad = np.zeros((20, 3), np.float32) + 100.0
        src_p = np.concatenate([src, pad])
        w = np.concatenate([np.ones(100), np.zeros(20)]).astype(np.float32)
        dst = src + np.array([1.0, 0, 0], np.float32)
        res = iterative_closest_point(
            jnp.asarray(src_p), jnp.asarray(dst), jnp.asarray(w), iterations=10
        )
        np.testing.assert_allclose(np.asarray(res.t), [1, 0, 0], atol=1e-3)


def _traj(n, rng, noise=0.0):
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i in range(n):
        poses[i, :3, 3] = [i * 1.0, 0, 0]
        if noise:
            poses[i, :3, 3] += rng.normal(size=3) * noise
    return poses


class TestTrajectoryMetrics:
    def test_ate_known_value(self):
        gt = _traj(5, None)
        pred = gt.copy()
        pred[:, 0, 3] += 0.5  # constant 0.5m x offset
        m = AbsoluteTrajectoryError(detailed=True)
        m.update(jnp.asarray(pred), jnp.asarray(gt))
        res = m.compute()
        np.testing.assert_allclose(res["ate_rmse"], 0.5, atol=1e-6)
        np.testing.assert_allclose(res["ate_rmse_per_dim"][0], 0.5, atol=1e-6)

    def test_rpe_identity_when_equal(self):
        rng = np.random.default_rng(4)
        gt = _traj(6, rng, noise=0.1)
        m = RelativePoseError(detailed=True)
        m.update(jnp.asarray(gt), jnp.asarray(gt))
        res = m.compute()
        assert res["rpe_trans_rmse"] < 1e-5
        assert res["rpe_rot_rmse"] < 0.1

    def test_rpe_translation_offset(self):
        gt = _traj(4, None)
        pred = gt.copy()
        # make relative steps 2m instead of 1m
        for i in range(4):
            pred[i, 0, 3] = i * 2.0
        m = RelativePoseError()
        m.update(jnp.asarray(pred), jnp.asarray(gt))
        res = m.compute()
        np.testing.assert_allclose(res["rpe_trans_rmse"], 1.0, atol=1e-5)

    def test_scale_consistency_zero_for_constant_scale(self):
        gt = _traj(5, None)
        pred = gt.copy()
        pred[:, :3, 3] *= 0.5
        m = ScaleConsistency()
        m.update(jnp.asarray(pred), jnp.asarray(gt))
        res = m.compute()
        assert res["scale_var"] < 1e-8


class TestChamfer:
    def test_zero_for_identical_clouds(self):
        rng = np.random.default_rng(5)
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        m = ChamferDistanceMetrics()
        m.update(jnp.asarray(pts), jnp.asarray(pts))
        res = m.compute()
        assert res["chamfer_distance_rmse"] < 1e-4

    def test_known_offset(self):
        # two interleaved grids offset by d: nn dist = d on both sides
        a = np.stack([np.arange(10), np.zeros(10), np.zeros(10)], -1).astype(np.float32)
        b = a.copy()
        b[:, 1] = 0.2
        m = ChamferDistanceMetrics(rmse=True)
        m.update(jnp.asarray(a), jnp.asarray(b))
        res = m.compute()
        # dists are squared (0.04); rmse of squared dists = 0.04
        np.testing.assert_allclose(res["chamfer_distance_rmse"], 0.04, atol=1e-5)

    def test_max_dist_clamp(self):
        a = np.zeros((1, 3), np.float32)
        b = np.full((1, 3), 100.0, np.float32)
        m = ChamferDistanceMetrics(max_dist=1.0)
        m.update(jnp.asarray(a), jnp.asarray(b))
        res = m.compute()
        np.testing.assert_allclose(res["chamfer_distance_rmse"], 1.0, atol=1e-5)


class TestPrepare:
    def test_find_subsample_factor(self):
        mask = np.ones((1, 2, 64, 64), bool)
        f = find_subsample_factor(mask, max_points=512)
        assert (64 // f) * (64 // f) * 2 <= 512
        # factor should be minimal-ish
        f2 = f - 1
        if f2 >= 1:
            assert (64 // f2) * (64 // f2) * 2 > 512 or f2 == f

    def test_prepare_end_to_end(self):
        batch = make_synthetic_batch(B=1, N=3, H=28, W=42)
        # fabricate a "prediction" = GT poses + GT depths
        from vitslam_tpu.geometry import extri_intri_to_pose_encoding
        pe = extri_intri_to_pose_encoding(
            jnp.asarray(batch["extrinsics"]), jnp.asarray(batch["intrinsics"]),
            (28, 42),
        )
        rng = np.random.default_rng(7)
        pred = {
            "pose_enc": np.asarray(pe),
            "depth": batch["depths"][..., None],
            # varied confidence: a constant field would be fully rejected by
            # the strict > quantile mask (same as the reference)
            "depth_conf": rng.uniform(1, 2, batch["depths"].shape).astype(np.float32),
        }
        pp, gp, pred_pts, gt_pts = prepare_data_for_metrics(
            pred, batch, max_points_icp=500, icp_iterations=5
        )
        assert pp.shape == (1, 3, 4, 4)
        assert len(pred_pts) == 1 and len(gt_pts) == 1
        assert gt_pts[0].shape[0] <= 500
        # prediction == GT -> aligned points should be close to GT cloud.
        # The bound reflects subsample density, not exactness: pred and GT
        # clouds are subsampled by different masks (conf-quantile vs GT
        # point_masks), so nearest neighbors are different surface samples.
        # (0.5 -> 0.7 after the reference-exact 'nearest' quantile +
        # antialias=False resize of the e2e parity oracle moved selection.)
        m = ChamferDistanceMetrics()
        m.update(jnp.asarray(pred_pts[0]), jnp.asarray(gt_pts[0]))
        assert m.compute()["chamfer_distance_rmse"] < 0.7

    def test_plots_write_files(self, tmp_path):
        gt = _traj(5, None)
        pred = gt.copy()
        pred[:, 0, 3] += 0.1
        out = str(tmp_path) + "/"
        res, png = AbsoluteTrajectoryError().plot(
            jnp.asarray(pred), jnp.asarray(gt), title="t", outpath=out
        )
        import os
        assert os.path.exists(png)
        assert os.path.exists(out + "traj_ate.npy")
        res, png = RelativePoseError().plot(jnp.asarray(pred), jnp.asarray(gt), outpath=out)
        assert os.path.exists(png)
        res, png = ScaleConsistency().plot(jnp.asarray(pred), jnp.asarray(gt), outpath=out)
        assert os.path.exists(png)
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        res, png = ChamferDistanceMetrics().plot(
            jnp.asarray(pts), jnp.asarray(pts + 0.01), outpath=out
        )
        assert os.path.exists(png)

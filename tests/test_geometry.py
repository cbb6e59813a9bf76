"""Unit tests for the geometry layer against closed-form cases
(SURVEY.md §4: Umeyama recovers a known Sim(3), quaternion averaging,
weighted-median scale vs brute force, SE(3) round trips)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitslam_tpu import geometry as G

pytestmark = pytest.mark.quick


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(G.quat_to_mat(jnp.asarray(q, jnp.float32)))


def random_se3(rng, scale_t=1.0):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = random_rotation(rng)
    T[:3, 3] = rng.normal(size=3) * scale_t
    return T


class TestRotations:
    def test_quat_mat_roundtrip(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(64, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        # canonical sign
        q = np.where(q[:, 3:4] < 0, -q, q)
        R = G.quat_to_mat(jnp.asarray(q))
        q2 = np.asarray(G.mat_to_quat(R))
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_mat_to_quat_orthonormal(self):
        rng = np.random.default_rng(1)
        for _ in range(10):
            R = random_rotation(rng)
            q = G.mat_to_quat(jnp.asarray(R))
            R2 = np.asarray(G.quat_to_mat(q))
            np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_average_quaternions_same_axis(self):
        # Average of rotations about one axis = rotation by mean angle.
        angles = np.array([0.1, 0.2, 0.3], dtype=np.float32)
        quats = np.stack(
            [np.array([np.sin(a / 2), 0, 0, np.cos(a / 2)]) for a in angles]
        ).astype(np.float32)
        avg = np.asarray(G.average_quaternions(jnp.asarray(quats)[None])[0])
        expected_angle = angles.mean()
        got_angle = 2 * np.arctan2(np.abs(avg[0]), np.abs(avg[3]))
        assert abs(got_angle - expected_angle) < 1e-3

    def test_rotation_angle(self):
        a = 0.7
        q = jnp.asarray([np.sin(a / 2), 0, 0, np.cos(a / 2)], jnp.float32)
        R = G.quat_to_mat(q)
        assert abs(float(G.rotation_angle(R)) - a) < 1e-4


class TestSE3:
    def test_closed_form_inverse(self):
        rng = np.random.default_rng(2)
        T = np.stack([random_se3(rng) for _ in range(8)])
        Tinv = np.asarray(G.closed_form_inverse_se3(jnp.asarray(T[:, :3, :4])))
        prod = Tinv @ T
        np.testing.assert_allclose(prod, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)

    def test_relative_poses(self):
        rng = np.random.default_rng(3)
        w2c = np.stack([random_se3(rng) for _ in range(5)])[None]  # (1,5,4,4)
        rel = np.asarray(G.compute_relative_poses(jnp.asarray(w2c), offset=2))
        # rel maps cam_s -> cam_{s+2}: w2c_{s+2} @ c2w_s
        expected = w2c[0, 2] @ np.linalg.inv(w2c[0, 0])
        np.testing.assert_allclose(rel[0, 0], expected[:3, :4], atol=1e-5)

    def test_apply_sim3_roundtrip(self):
        rng = np.random.default_rng(4)
        w2c = np.stack([random_se3(rng) for _ in range(4)])[None, :, :3, :4]
        T = random_se3(rng)[None]
        s = np.array([2.5], np.float32)
        out = G.apply_sim3_on_w2c(jnp.asarray(w2c), jnp.asarray(T), jnp.asarray(s))
        # c2w' = T @ scale(c2w); check camera centers transform correctly
        c2w = np.linalg.inv(np.concatenate([w2c[0], np.tile([[0, 0, 0, 1]], (4, 1, 1))], axis=1))
        centers = c2w[:, :3, 3] * s
        expected_centers = (T[0, :3, :3] @ centers.T).T + T[0, :3, 3]
        got_c2w = np.linalg.inv(np.asarray(out)[0])
        np.testing.assert_allclose(got_c2w[:, :3, 3], expected_centers, atol=1e-4)


class TestPoseEncoding:
    def test_7d_roundtrip(self):
        rng = np.random.default_rng(5)
        w2c = np.stack([random_se3(rng) for _ in range(6)]).reshape(2, 3, 4, 4)
        pe = G.extri_to_pose_encoding(jnp.asarray(w2c[..., :3, :4]))
        back = np.asarray(G.pose_encoding_to_extri(pe))
        np.testing.assert_allclose(back, w2c, atol=1e-5)

    def test_9d_roundtrip(self):
        rng = np.random.default_rng(6)
        w2c = np.stack([random_se3(rng) for _ in range(4)]).reshape(1, 4, 4, 4)
        H, W = 140, 196
        K = np.tile(np.array([[120.0, 0, W / 2], [0, 130.0, H / 2], [0, 0, 1]], np.float32), (1, 4, 1, 1))
        pe = G.extri_intri_to_pose_encoding(
            jnp.asarray(w2c[..., :3, :4]), jnp.asarray(K), (H, W)
        )
        assert pe.shape == (1, 4, 9)
        extr, intr = G.pose_encoding_to_extri_intri(pe, (H, W))
        np.testing.assert_allclose(np.asarray(extr), w2c[..., :3, :4], atol=1e-4)
        np.testing.assert_allclose(np.asarray(intr), K, atol=1e-2)

    def test_average_pose_encodings(self):
        pe = jnp.asarray(
            [[[1.0, 0, 0, 0, 0, 0, 1], [3.0, 0, 0, 0, 0, 0, 1]]], jnp.float32
        )
        avg = np.asarray(G.average_pose_encodings(pe))
        assert avg.shape == (1, 1, 7)
        np.testing.assert_allclose(avg[0, 0, :3], [2, 0, 0], atol=1e-5)
        np.testing.assert_allclose(np.abs(avg[0, 0, 6]), 1.0, atol=1e-5)


class TestSolvers:
    def test_umeyama_recovers_known_sim3(self):
        rng = np.random.default_rng(7)
        x = rng.normal(size=(100, 3)).astype(np.float32)
        R_true = random_rotation(rng)
        s_true, t_true = 1.7, rng.normal(size=3).astype(np.float32)
        y = s_true * x @ R_true.T + t_true
        R, t, s = G.umeyama(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
        np.testing.assert_allclose(float(s), s_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)

    def test_umeyama_reflection_fix(self):
        # Degenerate planar points must still yield a proper rotation.
        rng = np.random.default_rng(8)
        x = rng.normal(size=(50, 3)).astype(np.float32)
        x[:, 2] = 0
        R_true = random_rotation(rng)
        y = x @ R_true.T
        R, t, s = G.umeyama(jnp.asarray(x), jnp.asarray(y))
        assert float(jnp.linalg.det(R)) > 0.99

    def test_weighted_umeyama_ignores_zero_weight_outliers(self):
        rng = np.random.default_rng(9)
        x = rng.normal(size=(80, 3)).astype(np.float32)
        R_true = random_rotation(rng)
        y = 2.0 * x @ R_true.T + 1.0
        y[:10] += 100.0  # outliers
        w = np.ones(80, np.float32)
        w[:10] = 0.0
        R, t, s = G.umeyama(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))
        np.testing.assert_allclose(float(s), 2.0, atol=1e-3)

    def test_irls_robust_to_outliers(self):
        rng = np.random.default_rng(10)
        x = rng.normal(size=(200, 3)).astype(np.float32)
        R_true = random_rotation(rng)
        y = 1.5 * x @ R_true.T + np.array([1, 2, 3], np.float32)
        y_noisy = y.copy()
        y_noisy[:20] += rng.normal(size=(20, 3)) * 5.0  # 10% outliers
        conf = np.ones(200, np.float32)
        R, t, s = G.irls_sim3_umeyama(
            jnp.asarray(x), jnp.asarray(y_noisy), jnp.asarray(conf), jnp.asarray(conf)
        )
        assert abs(float(s) - 1.5) < 0.05
        np.testing.assert_allclose(np.asarray(R), R_true, atol=0.05)

    def test_method_of_horn(self):
        rng = np.random.default_rng(11)
        x = rng.normal(size=(40, 3)).astype(np.float32)
        R_true = random_rotation(rng)
        y = 0.5 * x @ R_true.T + np.array([0.1, -0.2, 0.3], np.float32)
        R, t, s = G.method_of_horn(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(float(s), 0.5, atol=1e-4)
        aligned = float(s) * x @ np.asarray(R).T + np.asarray(t)
        np.testing.assert_allclose(aligned, y, atol=1e-4)

    def test_scale_lse(self):
        rng = np.random.default_rng(12)
        x = rng.normal(size=(30,)).astype(np.float32)
        s = G.scale_lse_solver(jnp.asarray(x), jnp.asarray(-3.0 * x))
        np.testing.assert_allclose(float(s), 3.0, atol=1e-5)

    def test_weighted_median_scale_vs_bruteforce(self):
        rng = np.random.default_rng(13)
        x = np.abs(rng.normal(size=(1, 200))).astype(np.float32) + 0.1
        true_s = 2.3
        y = true_s * x
        y[0, :20] *= 10  # outliers the L1 solver should resist
        w = np.ones_like(x)
        s = float(G.weighted_median_scale(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))[0])
        # brute force over candidate scales
        cand = np.linspace(0.1, 30, 3000)
        losses = [np.sum(w * np.abs(c * x - y)) for c in cand]
        s_bf = cand[int(np.argmin(losses))]
        assert abs(s - s_bf) < 0.05
        assert abs(s - true_s) < 0.1

    def test_depth_scale_weights_masks(self):
        d = jnp.asarray([[1.0, 2.0, 100.0, 0.001]], jnp.float32)
        m = jnp.asarray([[1.0, 1.0, 0.0, 1.0]], jnp.float32)
        c = jnp.ones_like(d)
        w = np.asarray(G.depth_scale_weights(d, m, c))
        assert w[0, 2] == 0.0
        # tiny depth clamped at 0.1*mean → bounded weight
        assert w[0, 3] <= 1.0 / (0.1 * float((1.0 + 2.0 + 0.001) / 3) * 0.999)


class TestProjection:
    def test_unproject_project_roundtrip(self):
        rng = np.random.default_rng(14)
        B, S, H, W = 1, 2, 8, 12
        depth = (rng.uniform(1, 10, size=(B, S, H, W, 1))).astype(np.float32)
        w2c = np.stack([random_se3(rng, 0.5) for _ in range(S)])[None, :, :3, :4]
        K = np.tile(
            np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32),
            (B, S, 1, 1),
        )
        pts = G.unproject_depth_to_points(jnp.asarray(depth), jnp.asarray(w2c), jnp.asarray(K))
        pix, valid = G.project_points_to_pixels(pts, jnp.asarray(w2c), jnp.asarray(K))
        uu, vv = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
        np.testing.assert_allclose(np.asarray(pix[..., 0]), np.tile(uu, (B, S, 1, 1)), atol=1e-2)
        np.testing.assert_allclose(np.asarray(pix[..., 1]), np.tile(vv, (B, S, 1, 1)), atol=1e-2)
        assert bool(jnp.all(valid))
        # third component keeps only the SIGN of camera depth after the
        # |w| division (reference behavior: behind-camera points get -1)
        np.testing.assert_allclose(np.asarray(pix[..., 2]), np.ones((B, S, H, W)), atol=1e-4)

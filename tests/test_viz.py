"""Headless viz-layer smoke tests (VERDICT r2 weak #7): drive the
viser-free half of the visualization stack — point-cloud building, the
orchestrator's viz-dict marshalling, and the .npy dump path — without a
display or the optional viser/onnxruntime deps. The interactive half
(viser_wrapper server, sky-seg ONNX) stays import-guarded; when viser is
absent its entry point must fail with the documented actionable error.

Reference parity: aligned_vggt/utils/visualization.py:22-286 and
training/training_metrics.py save-for-visualization paths.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.quick


def _fake_scene(S=3, H=8, W=10):
    rng = np.random.default_rng(0)
    f = 0.9 * W
    intr = np.stack([np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])] * S)
    extr = np.stack([np.eye(4)[:3] for _ in range(S)])
    for i in range(S):
        extr[i, 0, 3] = 0.1 * i
    return {
        "images": rng.uniform(0, 1, (S, 3, H, W)).astype(np.float32),
        "extrinsic": extr.astype(np.float32),
        "intrinsic": intr.astype(np.float32),
        "depth": rng.uniform(2, 20, (S, H, W, 1)).astype(np.float32),
        "depth_conf": rng.uniform(0, 5, (S, H, W)).astype(np.float32),
        "world_points": rng.normal(0, 5, (S, H, W, 3)).astype(np.float32),
        "world_points_conf": rng.uniform(0, 5, (S, H, W)).astype(np.float32),
    }


class TestBuildPointCloud:
    def test_depth_unprojection_path(self):
        from vitslam_tpu.viz.viser_viz import build_point_cloud

        d = _fake_scene()
        pts, colors, conf, frame_idx = build_point_cloud(d)
        n = 3 * 8 * 10
        assert pts.shape == (n, 3) and colors.shape == (n, 3)
        assert conf.shape == (n,) and frame_idx.shape == (n,)
        assert np.isfinite(pts).all()
        assert colors.min() >= 0 and colors.max() <= 1
        assert frame_idx.max() == 2
        # identity-rotation camera: unprojected z == depth
        np.testing.assert_allclose(
            pts[:80, 2], d["depth"][0, ..., 0].reshape(-1), rtol=1e-5)

    def test_world_points_fallback(self):
        from vitslam_tpu.viz.viser_viz import build_point_cloud

        d = _fake_scene()
        del d["depth"], d["depth_conf"]
        pts, _, conf, _ = build_point_cloud(d)
        np.testing.assert_allclose(pts, d["world_points"].reshape(-1, 3))
        np.testing.assert_allclose(conf, d["world_points_conf"].reshape(-1))

    def test_viser_entry_fails_actionably_when_absent(self):
        pytest.importorskip  # noqa: B018 - keep the skip helper visible
        try:
            import viser  # noqa: F401

            pytest.skip("viser installed; interactive path not under test")
        except ImportError:
            pass
        from vitslam_tpu.viz.viser_viz import viser_wrapper

        with pytest.raises(ImportError, match="viser is not installed"):
            viser_wrapper(_fake_scene())


class TestVizDictMarshalling:
    def _preds_and_seq(self, S=3, H=8, W=10):
        scene = _fake_scene(S, H, W)
        rng = np.random.default_rng(1)
        preds = {
            "pose_enc": rng.normal(0, 0.1, (1, S, 9)).astype(np.float32),
            "images": scene["images"][None],
            "depth": scene["depth"][None],
            "depth_conf": scene["depth_conf"][None],
            "world_points": scene["world_points"][None],
            "world_points_conf": scene["world_points_conf"][None],
        }
        seq_data = {
            "images": scene["images"][None],
            "intrinsics": scene["intrinsic"][None],
            "extrinsics": scene["extrinsic"][None],
            "world_points": scene["world_points"][None],
            "point_masks": (scene["world_points_conf"] > 1)[None],
            "depths": scene["depth"][None, ..., 0],
        }
        return preds, seq_data

    def test_viz_dict_keys_and_shapes(self):
        from vitslam_tpu.eval.orchestrator import Metrics

        preds, seq_data = self._preds_and_seq()
        out = Metrics._viz_dict(preds, seq_data)
        assert {"extrinsic", "intrinsic", "images", "depth",
                "world_points"} <= set(out)
        assert out["extrinsic"].shape == (3, 3, 4)
        assert out["intrinsic"].shape == (3, 3, 3)
        # 9-d pose encodings decode extrinsic+intrinsic from the encoding
        assert np.isfinite(out["extrinsic"]).all()

    def test_save_dump_roundtrip(self, tmp_path):
        from vitslam_tpu.eval.orchestrator import Metrics

        preds, seq_data = self._preds_and_seq()
        m = Metrics(save_for_visualization=True, log_dir=str(tmp_path))
        prefix = str(tmp_path) + "/"
        m.save_dict_for_visualization(preds, seq_data, prefix)
        viz = np.load(prefix + "visualization_data.npy",
                      allow_pickle=True).item()
        gt = np.load(prefix + "visualization_data_gt.npy",
                     allow_pickle=True).item()
        assert {"extrinsic", "intrinsic", "images"} <= set(viz)
        assert {"images", "extrinsic", "intrinsic", "world_points",
                "world_points_conf", "depth", "depth_conf"} <= set(gt)
        # the dumped dict must be directly consumable by the point-cloud
        # builder (what a user loads into the viser session elsewhere)
        from vitslam_tpu.viz.viser_viz import build_point_cloud

        pts, colors, conf, _ = build_point_cloud(viz)
        assert np.isfinite(pts).all() and len(pts) == len(colors) == len(conf)
        pts_gt, _, _, _ = build_point_cloud(gt)
        assert np.isfinite(pts_gt).all()

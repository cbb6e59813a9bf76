"""Native C++ kernels vs numpy reference implementations."""
import numpy as np
import pytest

from vitslam_tpu.native import (
    depth_to_points_native, lidar_splat_depth_native, native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_depth_to_points_matches_numpy():
    from vitslam_tpu.data import preprocess as pp

    rng = np.random.default_rng(0)
    H, W = 16, 24
    depth = rng.uniform(1, 10, (H, W)).astype(np.float32)
    depth[0, 0] = 0.0
    K = np.array([[30.0, 0, W / 2], [0, 31.0, H / 2], [0, 0, 1]])
    a = 0.2
    extr = np.array(
        [[np.cos(a), 0, np.sin(a), 0.5], [0, 1, 0, -0.2],
         [-np.sin(a), 0, np.cos(a), 1.0]], np.float64
    )
    world_n, cam_n, mask_n = depth_to_points_native(depth, extr, K)

    # numpy reference (the fallback body)
    u, v = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    pix = np.stack([u, v, np.ones_like(u)], -1).reshape(-1, 3).astype(np.float64)
    rays = pix @ np.linalg.inv(K).T
    cam = rays * depth.reshape(-1, 1)
    world = (cam - extr[:3, 3]) @ extr[:3, :3]
    np.testing.assert_allclose(cam_n.reshape(-1, 3), cam, atol=1e-4)
    np.testing.assert_allclose(world_n.reshape(-1, 3), world, atol=1e-4)
    assert not mask_n[0, 0]
    assert mask_n[1:].all()


def test_lidar_splat_matches_numpy():
    from vitslam_tpu.data.waymo import lidar_to_depth
    import os

    rng = np.random.default_rng(1)
    K = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    extr = np.eye(4)[:3]
    pts = rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(2, 20, 500)
    pts_h = np.concatenate([pts, np.ones((500, 1), np.float32)], -1).T

    d_native = lidar_splat_depth_native(pts, K, extr, (24, 32))
    # force the numpy path
    os.environ["VITSLAM_NATIVE"] = "0"
    try:
        import vitslam_tpu.native.bindings as b
        saved_lib, saved_tried = b._lib, b._tried
        b._lib, b._tried = None, True
        d_numpy = lidar_to_depth(pts_h, K, extr, (24, 32))
    finally:
        b._lib, b._tried = saved_lib, saved_tried
        os.environ.pop("VITSLAM_NATIVE", None)
    np.testing.assert_allclose(d_native, d_numpy, atol=1e-4)

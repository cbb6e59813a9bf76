"""Fixture generators: write miniature VKITTI / KITTI-Odometry directory
trees with geometrically consistent synthetic content, so the dataset
readers are exercised end-to-end without real data (SURVEY.md §7.6:
'synthetic fixture generator for tests')."""
from __future__ import annotations

import os
import os.path as osp

import numpy as np


def _se3(yaw: float, t: np.ndarray) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = np.array(
        [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]]
    )
    T[:3, 3] = t
    return T


def write_vkitti_fixture(root: str, scene: str = "01", setting: str = "clone",
                         camera_id: int = 0, n_frames: int = 10,
                         hw=(56, 84), seed: int = 0) -> str:
    """Write Scene<scene>/<setting>/frames/rgb/Camera_<id> with rgb jpgs,
    depth pngs (centimeters, uint16), extrinsic.txt and intrinsic.txt in
    the VKITTI 2 format the reader expects."""
    import cv2

    rng = np.random.default_rng(seed)
    H, W = hw
    scene_dir = osp.join(root, f"Scene{scene}", setting)
    rgb_dir = osp.join(scene_dir, "frames", "rgb", f"Camera_{camera_id}")
    depth_dir = osp.join(scene_dir, "frames", "depth", f"Camera_{camera_id}")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)

    extr_rows = ["frame cameraID r1,1 r1,2 r1,3 t1 r2,1 r2,2 r2,3 t2 r3,1 r3,2 r3,3 t3 0 0 0 1"]
    intr_rows = ["frame cameraID K[0,0] K[1,1] K[0,2] K[1,2]"]
    f = 0.9 * W
    for i in range(n_frames):
        img = (rng.uniform(0, 255, size=(H, W, 3))).astype(np.uint8)
        cv2.imwrite(osp.join(rgb_dir, f"rgb_{i:05d}.jpg"), img)
        depth_m = rng.uniform(2.0, 40.0, size=(H, W)).astype(np.float32)
        cv2.imwrite(
            osp.join(depth_dir, f"depth_{i:05d}.png"),
            (depth_m * 100).astype(np.uint16),
        )
        for cam in (0, 1):
            T = _se3(0.01 * i, np.array([0.1 * i + 0.05 * cam, 0, -0.4 * i]))
            extr_rows.append(
                f"{i} {cam} " + " ".join(f"{v:.6f}" for v in T.reshape(-1))
            )
            intr_rows.append(f"{i} {cam} {f:.4f} {f:.4f} {W/2:.1f} {H/2:.1f}")
    with open(osp.join(scene_dir, "extrinsic.txt"), "w") as fh:
        fh.write("\n".join(extr_rows) + "\n")
    with open(osp.join(scene_dir, "intrinsic.txt"), "w") as fh:
        fh.write("\n".join(intr_rows) + "\n")
    return root


def write_kitti_odometry_fixture(root: str, seq: str = "00",
                                 n_frames: int = 8, hw=(56, 84),
                                 seed: int = 0) -> str:
    import cv2

    rng = np.random.default_rng(seed)
    H, W = hw
    img_dir = osp.join(root, "sequences", seq, "image_2")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(osp.join(root, "poses"), exist_ok=True)
    poses = []
    for i in range(n_frames):
        img = (rng.uniform(0, 255, size=(H, W, 3))).astype(np.uint8)
        cv2.imwrite(osp.join(img_dir, f"{i:06d}.png"), img)
        c2w = _se3(0.01 * i, np.array([0.2 * i, 0, 1.0 * i]))
        poses.append(" ".join(f"{v:.6e}" for v in c2w[:3].reshape(-1)))
    with open(osp.join(root, "poses", f"{seq}.txt"), "w") as fh:
        fh.write("\n".join(poses) + "\n")
    f = 0.9 * W
    P2 = np.array([[f, 0, W / 2, 0], [0, f, H / 2, 0], [0, 0, 1, 0]])
    with open(osp.join(root, "sequences", seq, "calib.txt"), "w") as fh:
        for name in ("P0", "P1", "P2", "P3"):
            fh.write(f"{name}: " + " ".join(f"{v:.6e}" for v in P2.reshape(-1)) + "\n")
    return root


def write_waymo_fixture(root: str, seq: str = "seq0000", split: str = "training",
                        camera: str = "cam_01", n_frames: int = 6,
                        hw=(48, 64), n_lidar: int = 400, seed: int = 0) -> str:
    """Write the preprocessed-Waymo layout the reader expects:
    <split>/<seq>/frames/<cam>/NNNNNNNNNN.jpg, .../lidar/NNNNNNNNNN.npy,
    poses.npy, calibration.pkl (normalized proj mats + dims)."""
    import pickle

    import cv2

    rng = np.random.default_rng(seed)
    H, W = hw
    seq_dir = osp.join(root, split, seq)
    img_dir = osp.join(seq_dir, "frames", camera)
    lidar_dir = osp.join(seq_dir, "lidar")  # reader maps /frames -> /lidar
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lidar_dir, exist_ok=True)

    poses = np.stack([_se3(0.01 * i, np.array([0.5 * i, 0, 0])) for i in range(n_frames)])
    np.save(osp.join(seq_dir, "poses.npy"), poses)
    cam_id = int(camera[-1])
    # normalized projection matrix: fx/cx expressed in half-image units
    proj = np.zeros((3, 3))
    proj[0, 0] = 1.5
    proj[1, 1] = 1.5
    proj[2, 2] = 1.0
    calib = {
        "dims": np.array([H, W]),
        "extrinsics": {cam_id: np.eye(4)},
        "proj_mats": {cam_id: proj},
    }
    with open(osp.join(seq_dir, "calibration.pkl"), "wb") as f:
        pickle.dump(calib, f)
    for i in range(n_frames):
        img = (rng.uniform(0, 255, size=(H, W, 3))).astype(np.uint8)
        cv2.imwrite(osp.join(img_dir, f"{i:010d}.jpg"), img)
        pts = rng.uniform(-3, 3, size=(n_lidar, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(3, 30, n_lidar)
        np.save(osp.join(lidar_dir, f"{i:010d}.npy"), pts)
    return root

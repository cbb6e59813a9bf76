"""Interactive 3D visualization via Viser (host-side).

Behavior parity with aligned_vggt/utils/visualization.py:22-286
(viser_wrapper + sky_seg_mod): point cloud preferentially from unprojected
depth maps (falling back to point maps), confidence-percentile slider,
per-frame filter dropdown, camera frusta with click-to-teleport, scene
recentering, optional ONNX sky segmentation multiplying confidences.

``viser`` / ``onnxruntime`` are optional host-side dependencies (not baked
into this environment); all entry points degrade with a clear error.
"""
from __future__ import annotations

import numpy as np

from ..geometry import closed_form_inverse_se3, unproject_depth_to_points


def _require_viser():
    try:
        import viser  # noqa: F401

        return viser
    except ImportError as e:  # pragma: no cover - optional dep
        raise ImportError(
            "viser is not installed in this environment; install `viser` to "
            "use the interactive visualizer (predictions can still be dumped "
            "with Metrics.save_dict_for_visualization and viewed elsewhere)."
        ) from e


def build_point_cloud(pred_dict: dict):
    """Points + colors + per-point confidence + frame index from a
    prediction dict (unprojected depths preferred — visualization.py:62-67)."""
    import jax.numpy as jnp

    images = np.asarray(pred_dict["images"])  # (S, 3, H, W) in [0,1]
    S, _, H, W = images.shape
    if "depth" in pred_dict:
        pts = np.asarray(unproject_depth_to_points(
            jnp.asarray(pred_dict["depth"])[None],
            jnp.asarray(pred_dict["extrinsic"])[None],
            jnp.asarray(pred_dict["intrinsic"])[None],
        ))[0]
        conf = np.asarray(pred_dict["depth_conf"])
    else:
        pts = np.asarray(pred_dict["world_points"])
        conf = np.asarray(pred_dict["world_points_conf"])
    colors = np.transpose(images, (0, 2, 3, 1)).reshape(-1, 3)
    frame_idx = np.repeat(np.arange(S), H * W)
    return pts.reshape(-1, 3), colors, conf.reshape(-1), frame_idx


def run_sky_segmentation(images: np.ndarray, conf: np.ndarray,
                         model_path: str = "skyseg.onnx") -> np.ndarray:
    """Multiply confidences by a sky mask from an ONNX segmentation model at
    320x320, threshold < 32 = sky (visualization.py:240-286). Host-side and
    optional: requires onnxruntime + the model artifact."""
    try:
        import cv2
        import onnxruntime as ort
    except ImportError as e:  # pragma: no cover - optional dep
        raise ImportError("sky segmentation needs onnxruntime + cv2") from e
    sess = ort.InferenceSession(model_path)
    S, _, H, W = images.shape
    out = conf.reshape(S, H, W).copy()
    for s in range(S):
        img = np.transpose(images[s], (1, 2, 0)) * 255.0
        inp = cv2.resize(img.astype(np.float32), (320, 320)) / 255.0
        pred = sess.run(None, {sess.get_inputs()[0].name:
                               inp.transpose(2, 0, 1)[None]})[0]
        mask = cv2.resize(pred.squeeze(), (W, H))
        out[s] *= (mask >= 32).astype(np.float32)
    return out.reshape(conf.shape)


def viser_wrapper(
    pred_dict: dict,
    port: int = 8080,
    init_conf_threshold: float = 50.0,
    background_mode: bool = False,
    mask_sky: bool = False,
):
    """Serve an interactive reconstruction viewer.

    pred_dict keys (S-leading, no batch dim): images (S,3,H,W) [0,1],
    extrinsic (S,3,4), intrinsic (S,3,3), and depth/depth_conf or
    world_points/world_points_conf.
    """
    viser = _require_viser()

    points, colors, conf, frame_idx = build_point_cloud(pred_dict)
    if mask_sky:
        conf = run_sky_segmentation(np.asarray(pred_dict["images"]), conf)

    # recenter scene on the point centroid (visualization.py:97-100)
    center = points.mean(axis=0)
    points = points - center
    c2w = np.asarray(closed_form_inverse_se3(
        np.asarray(pred_dict["extrinsic"], np.float32)
    ))
    c2w[:, :3, 3] -= center

    server = viser.ViserServer(port=port)
    server.gui.configure_theme(titlebar_content=None, control_layout="collapsible")

    threshold_slider = server.gui.add_slider(
        "confidence percentile", min=0.0, max=100.0, step=1.0,
        initial_value=init_conf_threshold,
    )
    frame_options = ["all"] + [str(i) for i in range(len(c2w))]
    frame_select = server.gui.add_dropdown("show frame", frame_options, "all")

    cloud = server.scene.add_point_cloud(
        "/points", points=points, colors=colors, point_size=0.02,
    )

    def update_cloud(_=None):
        thr = np.percentile(conf, threshold_slider.value)
        keep = conf >= thr
        if frame_select.value != "all":
            keep &= frame_idx == int(frame_select.value)
        cloud.points = points[keep]
        cloud.colors = colors[keep]

    threshold_slider.on_update(update_cloud)
    frame_select.on_update(update_cloud)
    update_cloud()

    # camera frusta with click-to-teleport (visualization.py:127-182)
    images = np.asarray(pred_dict["images"])
    H, W = images.shape[-2:]
    for i, pose in enumerate(c2w):
        fov = 2 * np.arctan2(H / 2, float(np.asarray(pred_dict["intrinsic"])[i, 1, 1]))
        frustum = server.scene.add_camera_frustum(
            f"/cameras/{i}", fov=float(fov), aspect=W / H, scale=0.1,
            image=(np.transpose(images[i], (1, 2, 0)) * 255).astype(np.uint8),
            wxyz=viser.transforms.SO3.from_matrix(pose[:3, :3]).wxyz,
            position=pose[:3, 3],
        )

        def _attach(frustum=frustum):
            @frustum.on_click
            def _(_event):
                for client in server.get_clients().values():
                    client.camera.wxyz = frustum.wxyz
                    client.camera.position = frustum.position

        _attach()

    if not background_mode:  # pragma: no cover - interactive loop
        import time

        while True:
            time.sleep(1.0)
    return server

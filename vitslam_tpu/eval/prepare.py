"""Metric data preparation: pose-enc -> c2w matrices, prediction masks,
image-space subsampling for ICP, and the pred->GT ICP alignment.

Behavior parity with training/training_metrics.py:219-370
(prepare_data_for_metrics): points prefer unprojected depths over point maps
(:269-274); prediction mask at the ``valid_point_quantile`` (0.25) quantile
of confidence (:277-278); exponential + binary-search image-space
subsampling of the GT mask until <= max_points_icp survive (:282-321);
bilinear mask resampling thresholded at 0.5; ICP (30 iters) aligning pred
onto GT before Chamfer.

The subsample-factor search runs host-side on numpy (it is a tiny scalar
search over mask sums); the resampling/ICP run in JAX.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import (
    closed_form_inverse_se3,
    pose_encoding_to_extri,
    pose_encoding_to_extri_intri,
    unproject_depth_to_points,
)
from .icp import iterative_closest_point


def _resize_bshw(x: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear resize of (B, S, H, W, C) along the spatial dims
    (align_corners=False semantics via jax.image.resize 'linear')."""
    b, s, H, W, c = x.shape
    # antialias=False: the reference's F.interpolate(bilinear) does not
    # low-pass filter on downsampling (training_metrics.py:304), and the
    # 0.5-thresholded masks diverge if we do
    out = jax.image.resize(
        jnp.asarray(x, jnp.float32), (b, s, h, w, c), method="linear",
        antialias=False,
    )
    return np.asarray(out)


def find_subsample_factor(gt_mask: np.ndarray, max_points: int) -> int:
    """Exponential + binary search for the smallest integer stride whose
    bilinear-downsampled GT mask keeps <= max_points valid points."""
    B, S, H, W = gt_mask.shape
    m = gt_mask.reshape(B, S, H, W, 1).astype(np.float32)

    def count(factor: int) -> int:
        sub = _resize_bshw(m, max(1, H // factor), max(1, W // factor))
        return int((sub > 0.5).sum())

    valid = int(gt_mask.sum())
    if valid <= max_points:
        return 1
    factor = max(1, math.ceil(math.sqrt(valid / max_points)))
    last = 0
    while valid > max_points:
        if last > 0:
            last = factor
            factor *= 2
        else:
            last = factor
        if factor > max(H, W):
            break
        valid = count(factor)
    if last != factor:
        while last + 1 < factor:
            mid = (last + factor) // 2
            if count(mid) <= max_points:
                factor = mid
            else:
                last = mid
    return factor


def prepare_poses(pred_dict: dict, gt_dict: dict,
                  image_size_hw: tuple[int, int]):
    """Pose encodings (9-d or 7-d) -> (pred c2w, gt c2w, pred_extr, intr)."""
    pe = jnp.asarray(pred_dict["pose_enc"], jnp.float32)
    if pe.shape[-1] == 9:
        pred_extr, pred_intr = pose_encoding_to_extri_intri(pe, image_size_hw)
    elif pe.shape[-1] == 7:
        pred_extr = pose_encoding_to_extri(pe)[..., :3, :4]
        pred_intr = jnp.asarray(gt_dict["intrinsics"], jnp.float32)
    else:
        raise ValueError(f"unknown pose encoding width {pe.shape[-1]}")
    pred_poses = closed_form_inverse_se3(pred_extr)
    gt_poses = closed_form_inverse_se3(
        jnp.asarray(gt_dict["extrinsics"], jnp.float32)
    )
    return pred_poses, gt_poses, pred_extr, pred_intr


def prepare_data_for_metrics(
    pred_dict: dict,
    gt_dict: dict,
    valid_point_quantile: float = 0.25,
    max_points_icp: Optional[int] = None,
    want_points: bool = True,
    want_poses: bool = True,
    icp_iterations: int = 30,
):
    """Returns (pred_poses (B,S,4,4), gt_poses, pred_points list[np (Ni,3)],
    gt_points list[np (Mi,3)]) with points ICP-aligned pred->GT."""
    pred_poses = gt_poses = None
    pred_extr = pred_intr = None
    image_size_hw = tuple(np.asarray(gt_dict["images"]).shape[-2:]) \
        if "images" in gt_dict else None
    if want_poses:
        if image_size_hw is None:
            image_size_hw = tuple(np.asarray(gt_dict["depths"]).shape[-2:])
        pred_poses, gt_poses, pred_extr, pred_intr = prepare_poses(
            pred_dict, gt_dict, image_size_hw
        )
    if not want_points:
        return pred_poses, gt_poses, None, None

    # points: prefer unprojected depths over point maps
    if "depth" in pred_dict and pred_extr is not None:
        pred_points = unproject_depth_to_points(
            jnp.asarray(pred_dict["depth"], jnp.float32), pred_extr, pred_intr
        )
        conf = jnp.asarray(pred_dict["depth_conf"], jnp.float32)
    else:
        pred_points = jnp.asarray(pred_dict["world_points"], jnp.float32)
        conf = jnp.asarray(pred_dict["world_points_conf"], jnp.float32)

    # 'nearest' matches the reference's torch_quantile (kthvalue at
    # round(q*(n-1))+1, training_metrics.py:663-724), not linear interp
    thresh = jnp.quantile(conf, valid_point_quantile, method="nearest")
    pred_mask = np.asarray(conf > thresh)
    pred_points = np.asarray(pred_points)
    gt_points = np.asarray(gt_dict["world_points"], np.float32)
    gt_mask = np.asarray(gt_dict["point_masks"]) > 0.5
    B, S, H, W = gt_mask.shape

    if max_points_icp and gt_mask.sum() > max_points_icp:
        f = find_subsample_factor(gt_mask, max_points_icp)
        h, w = max(1, H // f), max(1, W // f)
        pred_points = _resize_bshw(pred_points, h, w)
        gt_points = _resize_bshw(gt_points, h, w)
        pred_mask = (
            _resize_bshw(pred_mask.astype(np.float32)[..., None], h, w)[..., 0]
            > 0.5
        )
        gt_mask = (
            _resize_bshw(gt_mask.astype(np.float32)[..., None], h, w)[..., 0]
            > 0.5
        )

    pred_list, gt_list = [], []
    for b in range(B):
        both = pred_mask[b] & gt_mask[b]
        p = pred_points[b][both]
        g = gt_points[b][gt_mask[b]]
        if len(p) >= 3 and len(g) >= 3:
            icp = iterative_closest_point(
                jnp.asarray(p), jnp.asarray(g), iterations=icp_iterations
            )
            p = np.asarray(icp.transformed)
        pred_list.append(p)
        gt_list.append(g)
    return pred_poses, gt_poses, pred_list, gt_list

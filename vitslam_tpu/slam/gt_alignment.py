"""Ground-truth alignment family: after the chunked predictions are merged,
resolve the global scale/Sim(3) ambiguity against GT before computing
losses/metrics.

Behavior parity with aligned_vggt/utils/alignment.py:131-469 and the
dispatcher alignAndConvertOutputs (aligned_vggt/utils/data.py:108-153),
supporting the 7 alignment types: per_frame_scale_from_poses,
per_chunk_scale_from_poses, scale_from_poses, scale_from_fc_poses,
scale_from_depths, sim3_from_poses, sim3_from_points, and none.

All solvers are batched pure-jnp (vmapped over B) instead of the
reference's per-element NumPy loops; prediction dicts are transformed
out-of-place.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import (
    apply_sim3_on_w2c,
    closed_form_inverse_se3,
    depth_scale_weights,
    extri_intri_to_pose_encoding,
    pad_to_4x4,
    pose_encoding_to_extri_intri,
    umeyama,
    weighted_median_scale,
)


def _as_jnp(d: dict) -> dict:
    return {k: jnp.asarray(v) if isinstance(v, (np.ndarray, jnp.ndarray)) else v
            for k, v in d.items()}


def _apply_scales(pred: dict, scales: jax.Array) -> dict:
    """Scale pose translations, depths and world points by per-batch scales."""
    out = dict(pred)
    B = scales.shape[0]
    if "pose_enc" in out:
        pe = jnp.asarray(out["pose_enc"])
        out["pose_enc"] = jnp.concatenate(
            [pe[..., :3] * scales[:, None, None], pe[..., 3:]], axis=-1
        )
    if "depth" in out:
        out["depth"] = jnp.asarray(out["depth"]) * scales.reshape(B, 1, 1, 1, 1)
    if "world_points" in out:
        out["world_points"] = (
            jnp.asarray(out["world_points"]) * scales.reshape(B, 1, 1, 1, 1)
        )
    out["alignment_scales"] = scales
    return out


def _lse_scale(x: jax.Array, y: jax.Array) -> jax.Array:
    """|sum(x*y)/sum(x^2)| over all but the leading batch axis."""
    axes = tuple(range(1, x.ndim))
    return jnp.abs(jnp.sum(x * y, axis=axes) / jnp.sum(x * x, axis=axes).clip(1e-12))


def scale_from_poses(pred: dict, batch: dict, seq_width: int = -1) -> dict:
    """One LSE scale per batch element from w2c positions
    (alignment.py:206-244)."""
    gt_pos = jnp.asarray(batch["extrinsics"])[..., :3, 3].astype(jnp.float32)
    pred_pos = jnp.asarray(pred["pose_enc"])[..., :3].astype(jnp.float32)
    if seq_width > 0:
        gt_pos, pred_pos = gt_pos[:, :seq_width], pred_pos[:, :seq_width]
    return _apply_scales(pred, _lse_scale(pred_pos, gt_pos))


def per_frame_scale_from_poses(pred: dict, batch: dict) -> dict:
    """One LSE scale per frame; frame 0 keeps scale 1 (alignment.py:131-165)."""
    gt_pos = jnp.asarray(batch["extrinsics"])[..., :3, 3].astype(jnp.float32)
    pe = jnp.asarray(pred["pose_enc"]).astype(jnp.float32)
    pred_pos = pe[..., :3]
    num = jnp.sum(pred_pos * gt_pos, axis=-1)
    den = jnp.sum(pred_pos * pred_pos, axis=-1).clip(1e-12)
    scales = jnp.abs(num / den)  # (B, S)
    scales = scales.at[:, 0].set(1.0)
    out = dict(pred)
    out["pose_enc"] = jnp.concatenate(
        [pe[..., :3] * scales[..., None], pe[..., 3:]], axis=-1
    )
    if "depth" in out:
        out["depth"] = jnp.asarray(out["depth"]) * scales[:, :, None, None, None]
    if "world_points" in out:
        out["world_points"] = (
            jnp.asarray(out["world_points"]) * scales[:, :, None, None, None]
        )
    out["alignment_scales"] = scales
    return out


def per_chunk_scale_from_poses(
    chunk_preds: list[dict], chunk_batches: list[dict]
) -> list[dict]:
    """One LSE scale per chunk, applied before merging (alignment.py:167-204)."""
    out = []
    for cp, cb in zip(chunk_preds, chunk_batches):
        gt_pos = jnp.asarray(cb["extrinsics"])[..., :3, 3].astype(jnp.float32)
        pred_pos = jnp.asarray(cp["pose_enc"])[..., :3].astype(jnp.float32)
        out.append(_apply_scales(cp, _lse_scale(pred_pos, gt_pos)))
    return out


def scale_from_depths(pred: dict, batch: dict) -> dict:
    """Robust L1-optimal scale per batch element via the weighted-median
    solver over S*H*W pixels (alignment.py:244-323): weights = mask *
    confidence * clamped inverse GT depth."""
    d_pred = jnp.asarray(pred["depth"]).astype(jnp.float32)
    conf = jnp.asarray(pred["depth_conf"]).astype(jnp.float32)
    d_gt = jnp.asarray(batch["depths"]).astype(jnp.float32)
    mask = jnp.asarray(batch["point_masks"]).astype(jnp.float32)
    B = d_pred.shape[0]
    x = d_pred.reshape(B, -1)
    y = d_gt.reshape(B, -1)
    m = mask.reshape(B, -1)
    w = depth_scale_weights(y, m, conf.reshape(B, -1))
    scales = weighted_median_scale(x, y, w)
    return _apply_scales(pred, jax.lax.stop_gradient(scales))


def sim3_from_poses(pred: dict, batch: dict, seq_width: int,
                    image_size_hw: tuple[int, int]) -> dict:
    """Umeyama Sim(3) on c2w camera positions (alignment.py:325-371)."""
    B = jnp.asarray(batch["extrinsics"]).shape[0]
    gt_c2w = closed_form_inverse_se3(
        pad_to_4x4(jnp.asarray(batch["extrinsics"])[:, :seq_width].astype(jnp.float32))
    )
    pred_extr, _ = pose_encoding_to_extri_intri(
        jnp.asarray(pred["pose_enc"])[:, :seq_width], image_size_hw
    )
    pred_c2w = closed_form_inverse_se3(pad_to_4x4(pred_extr))
    R, t, s = jax.vmap(umeyama)(pred_c2w[..., :3, 3], gt_c2w[..., :3, 3])
    T = jnp.zeros((B, 4, 4), jnp.float32)
    T = T.at[:, :3, :3].set(R).at[:, :3, 3].set(t).at[:, 3, 3].set(1.0)
    return apply_sim3_on_dict(pred, image_size_hw, T, s)


def sim3_from_points(pred: dict, batch: dict, seq_width: int,
                     image_size_hw: tuple[int, int],
                     confidence_threshold: float = 50.0) -> dict:
    """Umeyama Sim(3) on confidence-thresholded point maps
    (alignment.py:372-427): valid GT mask AND pred confidence above its
    per-batch ``confidence_threshold`` percentile AND > 1e-5; rejected
    points get weight 0 (static shapes) instead of removal."""
    pp = jnp.asarray(pred["world_points"])[:, :seq_width].astype(jnp.float32)
    pc = jnp.asarray(pred["world_points_conf"])[:, :seq_width].astype(jnp.float32)
    tp = jnp.asarray(batch["world_points"])[:, :seq_width].astype(jnp.float32)
    tm = jnp.asarray(batch["point_masks"])[:, :seq_width].astype(jnp.float32)
    B = pp.shape[0]
    pp_f = pp.reshape(B, -1, 3)
    tp_f = tp.reshape(B, -1, 3)
    pc_f = pc.reshape(B, -1)
    tm_f = tm.reshape(B, -1)
    thresh = jnp.percentile(pc_f, confidence_threshold, axis=-1, keepdims=True)
    w = ((tm_f > 0) & (pc_f >= thresh) & (pc_f > 1e-5)).astype(jnp.float32)
    R, t, s = jax.vmap(lambda a, b, ww: umeyama(a, b, ww))(pp_f, tp_f, w)
    T = jnp.zeros((B, 4, 4), jnp.float32)
    T = T.at[:, :3, :3].set(R).at[:, :3, 3].set(t).at[:, 3, 3].set(1.0)
    return apply_sim3_on_dict(pred, image_size_hw, T, s)


def apply_sim3_on_dict(pred: dict, image_size_hw, transforms: jax.Array,
                       scales: jax.Array) -> dict:
    """Apply a per-batch Sim(3) to pose encodings, point maps and depths
    (alignment.py:428-489). Depths only scale (the rigid part cancels for
    unprojected maps)."""
    out = dict(pred)
    B = transforms.shape[0]
    if "pose_enc" in out:
        extr, intr = pose_encoding_to_extri_intri(
            jnp.asarray(out["pose_enc"]), image_size_hw
        )
        extr = apply_sim3_on_w2c(extr, transforms, scales)
        out["pose_enc"] = extri_intri_to_pose_encoding(
            extr[..., :3, :4], intr, image_size_hw
        )
    if "world_points" in out:
        from ..geometry import apply_sim3_on_point_maps

        out["world_points"] = apply_sim3_on_point_maps(
            jnp.asarray(out["world_points"]), transforms, scales
        )
    if "depth" in out:
        out["depth"] = jnp.asarray(out["depth"]) * scales.reshape(B, 1, 1, 1, 1)
    out["alignment_transforms"] = transforms
    out["alignment_scales"] = scales
    return out


def align_outputs(
    pred: dict,
    batch: dict,
    alignment_type: str,
    seq_width: int = -1,
    image_size_hw: Optional[tuple[int, int]] = None,
) -> dict:
    """Dispatcher over merged predictions (data.py:108-153). The
    per_chunk_scale_from_poses variant is handled by the pipeline before
    merging (it needs chunked outputs)."""
    if alignment_type in (None, "none", "per_chunk_scale_from_poses"):
        return pred
    if image_size_hw is None and "images" in batch:
        image_size_hw = tuple(np.asarray(batch["images"]).shape[-2:])
    if alignment_type == "scale_from_fc_poses":
        return scale_from_poses(pred, batch, seq_width)
    if alignment_type == "scale_from_poses":
        return scale_from_poses(pred, batch)
    if alignment_type == "per_frame_scale_from_poses":
        return per_frame_scale_from_poses(pred, batch)
    if alignment_type == "scale_from_depths":
        if "depth" not in pred:
            raise ValueError("scale_from_depths needs the depth head enabled")
        return scale_from_depths(pred, batch)
    if alignment_type == "sim3_from_poses":
        return sim3_from_poses(pred, batch, seq_width, image_size_hw)
    if alignment_type == "sim3_from_points":
        if "world_points" not in pred:
            raise ValueError("sim3_from_points needs the point head enabled")
        return sim3_from_points(pred, batch, seq_width, image_size_hw)
    raise ValueError(f"unknown alignment type: {alignment_type!r}")

"""Multi-task training loss with per-loss warmup scheduling.

Behavior parity with training/loss.py:11-529 (MultitaskLoss): weighted sum of
  * absolute camera pose loss (L1/L2 on 9-d pose encodings vs GT encodings,
    valid-frame gate >100 points, translation clamp 100);
  * relative pose loss (consecutive + one random large-offset in [S/2, S)
    relative poses, quat+trans L1/L2, optional scale-agnostic norm);
  * depth loss (log-space L1 weighted by per-frame max-normalized
    confidence, optional quantile outlier filter, <100-point skip);
  * per-frame / per-chunk regularization pulling alignment outputs toward
    identity (||t|| + |1 - q_w^2|, + log(s)^2 for the chunk scale);
with linear/exp warmup scheduling per loss (warmup_percent,
warmup_start_percent, warmup_start_weight).

TPU-first: everything is static-shape — dynamic boolean indexing becomes
masked reductions, the random large offset is a traced scalar handled with
a roll-free gather + validity mask (no recompile per offset), and the
quantile filter uses a masked quantile. All gates (valid-frame, <100-point
skip) are ``jnp.where`` selects so one compiled graph covers all cases.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..geometry import extri_intri_to_pose_encoding, mat_to_quat, pad_to_4x4, pose_encoding_to_extri_intri
from ..slam.chunking import check_and_fix_inf_nan


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / jnp.sum(m).clip(1.0)


def _masked_quantile(x: jax.Array, mask: jax.Array, q: float) -> jax.Array:
    """Quantile of x over mask==1 entries (invalid -> +inf, sorted indexing).

    Index convention matches the reference's kthvalue-based torch_quantile
    (loss.py:459-525): 0-based index round(q * (n_valid - 1)), 'nearest'
    interpolation."""
    flat = jnp.where(mask.astype(bool).reshape(-1), x.reshape(-1), jnp.inf)
    order = jnp.sort(flat)
    n_valid = jnp.sum(mask).astype(jnp.int32)
    idx = jnp.clip(jnp.round(q * (n_valid - 1)).astype(jnp.int32),
                   0, flat.shape[0] - 1)
    return order[idx]


def _quantile_filter_mask(loss: jax.Array, mask: jax.Array,
                          valid_range: float, min_elements: int = 1000,
                          hard_max: float = 100.0):
    """Static-shape equivalent of the reference's filter_by_quantile
    (loss.py:421-456): clamp elements at hard_max, drop those >= the
    valid_range quantile — but only when more than min_elements are valid
    before AND after filtering.

    Returns (clamped_loss, filtered_mask)."""
    n_valid = jnp.sum(mask)
    clamped = jnp.minimum(loss, hard_max)
    thresh = jnp.minimum(
        _masked_quantile(clamped, mask, valid_range), hard_max
    )
    strict_mask = mask * (clamped < thresh).astype(jnp.float32)
    apply = (n_valid > min_elements) & (jnp.sum(strict_mask) > min_elements)
    out_mask = jnp.where(apply, strict_mask, mask)
    out_loss = jnp.where(n_valid > min_elements, clamped, loss)
    return out_loss, out_mask


def compute_warmup_weight(cfg: dict, current_step, total_steps: int,
                          warmup_exp: float = 2.0):
    """Scheduled loss weight (loss.py:45-96). ``current_step`` may be traced."""
    end_weight = cfg["weight"]
    warmup_steps = math.floor(total_steps * cfg.get("warmup_percent", 0.0))
    start_step = math.floor(total_steps * cfg.get("warmup_start_percent", 0.0))
    start_weight = cfg.get("warmup_start_weight", 0.0)
    warmup_type = cfg.get("warmup_type", "exp")

    if warmup_steps <= 0:
        return jnp.asarray(end_weight, jnp.float32)
    step = jnp.asarray(current_step, jnp.float32)
    frac = jnp.clip((step - start_step) / float(warmup_steps), 0.0, 1.0)
    if warmup_type == "exp":
        factor = frac ** warmup_exp
    elif warmup_type == "linear":
        factor = frac
    else:
        raise ValueError(f"invalid warmup type {warmup_type!r}")
    w = start_weight + (end_weight - start_weight) * factor
    w = jnp.where(step < start_step, 0.0, w)
    w = jnp.where(step > start_step + warmup_steps, end_weight, w)
    return w


def _valid_frame_gate(batch: dict) -> jax.Array:
    """Scalar {0,1}: any frame in the batch's first... (loss.py:171: frames
    with >100 valid points in batch-index-0's mask rows)."""
    pm = jnp.asarray(batch["point_masks"], jnp.float32)
    valid_frames = jnp.sum(pm[:, 0], axis=(-1, -2)) > 100
    return (jnp.sum(valid_frames) > 0).astype(jnp.float32)


def camera_pose_loss(pred: dict, batch: dict, loss_type: str = "l1", **_):
    pe = jnp.asarray(pred["pose_enc"], jnp.float32)
    image_hw = tuple(batch["images"].shape[-2:])
    gt_pe = extri_intri_to_pose_encoding(
        jnp.asarray(batch["extrinsics"], jnp.float32),
        jnp.asarray(batch["intrinsics"], jnp.float32), image_hw,
    )
    gate = _valid_frame_gate(batch)
    if loss_type == "l1":
        loss_t = jnp.abs(pe[..., :3] - gt_pe[..., :3])
        loss_r = jnp.abs(pe[..., 3:7] - gt_pe[..., 3:7])
    elif loss_type == "l2":
        loss_t = jnp.linalg.norm(pe[..., :3] - gt_pe[..., :3], axis=-1)
        loss_r = jnp.linalg.norm(pe[..., 3:7] - gt_pe[..., 3:7], axis=-1)
    else:
        raise ValueError(f"unknown loss type {loss_type!r}")
    loss_t = jnp.mean(jnp.clip(check_and_fix_inf_nan(loss_t), max=100.0)) * gate
    loss_r = jnp.mean(check_and_fix_inf_nan(loss_r)) * gate
    return {"loss_camera": loss_t + loss_r, "loss_T": loss_t, "loss_R": loss_r}


def _relative_poses_masked(extr4: jax.Array, offset: jax.Array):
    """Relative poses at a *traced* offset with static shapes: for each i,
    rel_i = w2c[min(i+offset, S-1)] @ c2w[i], valid where i + offset < S."""
    B, S = extr4.shape[:2]
    c2w = jnp.linalg.inv(extr4)
    idx = jnp.arange(S)
    j = jnp.clip(idx + offset, 0, S - 1)
    rel = jnp.take(extr4, j, axis=1) @ c2w
    valid = (idx + offset) < S
    return rel, valid


def relative_pose_loss(pred: dict, batch: dict, rng: jax.Array,
                       loss_type: str = "l1", weight_trans: float = 1.0,
                       weight_rot: float = 1.0, scale_agnostic: bool = False,
                       large_offset=None, **_):
    pe = jnp.asarray(pred["pose_enc"], jnp.float32)
    pred_extr, _ = pose_encoding_to_extri_intri(pe, (1, 1), build_intrinsics=False)
    pred4 = pad_to_4x4(pred_extr)
    gt4 = pad_to_4x4(jnp.asarray(batch["extrinsics"], jnp.float32))
    S = gt4.shape[1]
    gate = _valid_frame_gate(batch)

    if large_offset is None:
        large = jax.random.randint(rng, (), S // 2, max(S // 2 + 1, S))
    else:
        large = jnp.asarray(large_offset)
    losses_t, losses_r, masks = [], [], []
    for off in (jnp.asarray(1), large):
        gt_rel, valid = _relative_poses_masked(gt4, off)
        pr_rel, _ = _relative_poses_masked(pred4, off)
        gt_q = mat_to_quat(gt_rel[..., :3, :3])
        pr_q = mat_to_quat(pr_rel[..., :3, :3])
        gt_t = gt_rel[..., :3, 3]
        pr_t = pr_rel[..., :3, 3]
        if scale_agnostic:
            gt_t = gt_t / jnp.linalg.norm(gt_t, axis=-1, keepdims=True).clip(1e-8)
            pr_t = pr_t / jnp.linalg.norm(pr_t, axis=-1, keepdims=True).clip(1e-8)
        if loss_type == "l1":
            lt = jnp.abs(pr_t - gt_t).mean(-1)
            lr = jnp.abs(pr_q - gt_q).mean(-1)
        else:
            lt = jnp.linalg.norm(pr_t - gt_t, axis=-1)
            lr = jnp.linalg.norm(pr_q - gt_q, axis=-1)
        losses_t.append(jnp.clip(check_and_fix_inf_nan(lt), max=100.0))
        losses_r.append(check_and_fix_inf_nan(lr))
        masks.append(jnp.broadcast_to(valid[None], lt.shape))
    lt = _masked_mean(jnp.concatenate(losses_t, 1), jnp.concatenate(masks, 1)) * gate
    lr = _masked_mean(jnp.concatenate(losses_r, 1), jnp.concatenate(masks, 1)) * gate
    return {
        "loss_camera_rel": weight_trans * lt + weight_rot * lr,
        "loss_T_rel": lt,
        "loss_R_rel": lr,
    }


def depth_loss(pred: dict, batch: dict, valid_range: float = -1.0, **_):
    d_pred = jnp.asarray(pred["depth"], jnp.float32)[..., 0]
    conf = jnp.asarray(pred["depth_conf"], jnp.float32)
    d_gt = check_and_fix_inf_nan(jnp.asarray(batch["depths"], jnp.float32))
    mask = jnp.asarray(batch["point_masks"], jnp.float32)
    gate = (jnp.sum(mask) >= 100).astype(jnp.float32)

    conf = conf / jnp.max(conf, axis=(2, 3), keepdims=True).clip(1e-8)
    loss = jnp.abs(
        jnp.log(d_pred.clip(1e-8)) - jnp.log(d_gt.clip(1e-8))
    ) * conf
    if valid_range > 0:
        loss, mask = _quantile_filter_mask(loss, mask, valid_range)
    loss = check_and_fix_inf_nan(loss)
    return {"loss_depth": _masked_mean(loss, mask) * gate}


def per_frame_regularization_loss(pred: dict, **_):
    enc = jnp.asarray(pred["frame_se3_enc"], jnp.float32).reshape(-1, 7)
    t = enc[..., :3]
    q = enc[..., 3:7]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-8)
    loss_t = check_and_fix_inf_nan(jnp.linalg.norm(t, axis=-1))
    loss_r = check_and_fix_inf_nan(jnp.abs(1.0 - q[..., -1] ** 2))
    return {"loss_per_frame_reg":
            jnp.mean(jnp.clip(loss_t, max=100.0)) + jnp.mean(loss_r)}


def per_chunk_regularization_loss(pred: dict, **_):
    enc = jnp.asarray(pred["chunk_sim3_enc"], jnp.float32)
    t = enc[..., :3]
    q = enc[..., 3:7]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-8)
    loss_t = check_and_fix_inf_nan(jnp.linalg.norm(t, axis=-1))
    loss_r = check_and_fix_inf_nan(jnp.abs(1.0 - q[..., -1] ** 2))
    loss_s = 0.0
    if enc.shape[-1] == 8:
        loss_s = jnp.mean(
            check_and_fix_inf_nan(jnp.log(enc[..., 7].clip(1e-6)) ** 2)
        )
    return {"loss_per_chunk_reg":
            jnp.mean(jnp.clip(loss_t, max=100.0)) + jnp.mean(loss_r) + loss_s}


class MultitaskLoss:
    """Callable (predictions, batch, step, rng) -> loss dict with
    'objective'. Configuration dicts mirror the reference YAML keys."""

    def __init__(self, perFrameReg=None, perChunkReg=None, depth=None,
                 cameraPose=None, cameraPoseRel=None, total_steps: int = 1,
                 **_):
        self.perFrameReg = perFrameReg
        self.perChunkReg = perChunkReg
        self.depth = depth
        self.cameraPose = cameraPose
        self.cameraPoseRel = cameraPoseRel
        self.total_steps = total_steps

    def setup_scheduling(self, total_steps: int):
        self.total_steps = total_steps

    def __call__(self, predictions: dict, batch: dict, current_step,
                 rng: Optional[jax.Array] = None) -> dict:
        total = jnp.asarray(0.0, jnp.float32)
        out: dict = {}

        def w(cfg):
            return compute_warmup_weight(cfg, current_step, self.total_steps)

        if "frame_se3_enc" in predictions and self.perFrameReg is not None:
            d = per_frame_regularization_loss(predictions)
            total = total + d["loss_per_frame_reg"] * w(self.perFrameReg)
            out.update(d)
        if "chunk_sim3_enc" in predictions and self.perChunkReg is not None:
            d = per_chunk_regularization_loss(predictions)
            total = total + d["loss_per_chunk_reg"] * w(self.perChunkReg)
            out.update(d)
        if "depth" in predictions and self.depth is not None:
            d = depth_loss(predictions, batch, **self.depth)
            total = total + d["loss_depth"] * w(self.depth)
            out.update(d)
        if "pose_enc" in predictions and self.cameraPose is not None:
            d = camera_pose_loss(predictions, batch, **self.cameraPose)
            total = total + d["loss_camera"] * w(self.cameraPose)
            out.update(d)
        if "pose_enc" in predictions and self.cameraPoseRel is not None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            d = relative_pose_loss(predictions, batch, rng, **self.cameraPoseRel)
            total = total + d["loss_camera_rel"] * w(self.cameraPoseRel)
            out.update(d)
        out["objective"] = total
        return out

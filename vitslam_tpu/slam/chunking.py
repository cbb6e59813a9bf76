"""Chunk scheduling and sequence assembly.

The chunk-and-align mechanism is the reference's entire answer to long
sequences (SURVEY.md §5.7). This module provides:
  * ``generate_chunks`` — index schedules (behavior parity with
    aligned_vggt/utils/data.py:155-207: modes chunk_gt / chunk_overlap /
    all / two_chunks, including the remainder-chunk rules);
  * ``chunk_batch`` — per-chunk batch slicing (data.py:209-226);
  * ``merge_chunk_outputs`` — overlap-deduplicating concatenation of
    per-chunk output dicts (data.py:54-87, convertDictListsToTensors);
  * ``normalize_extrinsics_and_points`` — first-camera-centric GT
    normalization (data.py:241-335) as a pure jnp function (the reference
    asserts CPU; here it jits and can run on device);
  * ``check_and_fix_inf_nan`` — NaN/Inf scrubbing (vggt
    train_utils.general, used at loss.py:6).
"""
from __future__ import annotations

import random
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import closed_form_inverse_se3, pad_to_4x4

# keys concatenated along the frame axis with overlap dedup
FRAME_AXIS_KEYS = (
    "pose_enc", "world_points", "world_points_conf", "depth", "depth_conf",
    "extrinsics", "intrinsics", "scales", "cam_points", "depths",
    "point_masks", "images", "ids",
)
# per-chunk outputs concatenated without dedup (one entry per chunk/frame-1)
CHUNK_AXIS_KEYS = ("chunk_sim3_enc", "frame_se3_enc")
# list-valued keys merged element-wise along the frame axis (data.py:73-80)
NESTED_LIST_KEYS = ("pose_enc_list",)


def generate_chunks(
    num_frames: int,
    mode: str,
    seq_width: int,
    overlap: int,
    rng: Optional[random.Random] = None,
) -> list[list[int]]:
    """Generate per-chunk frame-index lists.

    Modes:
      * ``chunk_gt``: non-overlapping width-``seq_width`` chunks + remainder;
      * ``chunk_overlap``: stride ``seq_width - overlap`` chunks + a smaller
        remainder chunk covering the tail; a sequence shorter than
        ``seq_width`` becomes one chunk;
      * ``all``: a single chunk with every frame;
      * ``two_chunks``: a random disjoint split into two chunks (train-only
        ablation mode).
    """
    indices: list[list[int]] = []
    if mode == "chunk_gt":
        for i in range(0, num_frames - seq_width + 1, seq_width):
            indices.append(list(range(i, i + seq_width)))
        if len(indices) * seq_width < num_frames:
            indices.append(list(range(len(indices) * seq_width, num_frames)))
    elif mode == "chunk_overlap":
        if num_frames < seq_width:
            indices.append(list(range(num_frames)))
        else:
            stride = seq_width - overlap
            for i in range(0, num_frames - seq_width + 1, stride):
                indices.append(list(range(i, i + seq_width)))
            if len(indices) * stride < num_frames - overlap:
                indices.append(list(range(len(indices) * stride, num_frames)))
    elif mode == "all":
        indices = [list(range(num_frames))]
    elif mode == "two_chunks":
        if num_frames < 2:
            raise ValueError("two_chunks mode needs at least 2 frames")
        rng = rng or random
        if num_frames == 2:
            indices = [[0, 1]]
        else:
            all_idx = list(range(num_frames))
            first_size = rng.randint(1, num_frames - 1)
            first = sorted(rng.sample(all_idx, first_size))
            second = [i for i in all_idx if i not in first]
            indices = [first, second]
    else:
        raise ValueError(f"unknown chunking mode: {mode!r}")
    return indices


def chunk_batch(batch: dict, indices: Sequence[Sequence[int]]) -> list[dict]:
    """Slice every array value of ``batch`` (B, N, ...) into per-chunk dicts."""
    chunks = []
    for chunk_ids in indices:
        ids = np.asarray(chunk_ids)
        chunk = {}
        for key, val in batch.items():
            if hasattr(val, "ndim") and val.ndim >= 2:
                chunk[key] = (
                    np.asarray(val)[:, ids] if isinstance(val, np.ndarray)
                    else jnp.take(val, jnp.asarray(ids), axis=1)
                )
        chunks.append(chunk)
    return chunks


def merge_chunk_outputs(chunk_dicts: Sequence[dict], overlap: int) -> dict:
    """Concatenate per-chunk dicts along the frame axis, dropping the first
    ``overlap`` frames of every chunk but the first for frame-axis keys;
    chunk-axis keys (sim3/se3 encodings) concatenate without dedup.

    Works on host numpy arrays (the driver offloads chunk outputs to host
    as they are produced)."""
    if not chunk_dicts:
        return {}
    merged: dict = {}
    for key in chunk_dicts[0]:
        if key in NESTED_LIST_KEYS:
            # list-valued entries (e.g. the camera head's iterative
            # pose_enc_list) merge element-wise across chunks
            # (data.py:73-80)
            per_chunk = [d[key] for d in chunk_dicts if key in d]
            merged[key] = [
                _merge_frame_axis([np.asarray(c[i]) for c in per_chunk],
                                  overlap)
                for i in range(len(per_chunk[0]))
            ]
            continue
        vals = [np.asarray(d[key]) for d in chunk_dicts if key in d]
        if key in CHUNK_AXIS_KEYS:
            merged[key] = np.concatenate(vals, axis=1)
        elif key in FRAME_AXIS_KEYS:
            merged[key] = _merge_frame_axis(vals, overlap)
        else:
            merged[key] = vals[-1]  # keep latest (e.g. tokens, diagnostics)
    return merged


def _merge_frame_axis(vals: list[np.ndarray], overlap: int) -> np.ndarray:
    if overlap > 0:
        vals = [vals[0]] + [v[:, overlap:] for v in vals[1:]]
    return np.concatenate(vals, axis=1)


def check_and_fix_inf_nan(
    x: jax.Array, name: str = "tensor", hard_max: Optional[float] = None
) -> jax.Array:
    """Replace NaN/Inf with 0 and optionally clamp to [-hard_max, hard_max].

    Reference parity: vggt training.train_utils.general.check_and_fix_inf_nan
    (call sites loss.py:198-199,294-295, utils/data.py:330-333)."""
    x = jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
    if hard_max is not None:
        x = jnp.clip(x, -hard_max, hard_max)
    return x


def normalize_extrinsics_and_points(
    extrinsics: jax.Array,
    cam_points: Optional[jax.Array] = None,
    world_points: Optional[jax.Array] = None,
    depths: Optional[jax.Array] = None,
    scale_by_points: bool = False,
    point_masks: Optional[jax.Array] = None,
):
    """Re-express GT extrinsics/world points in the first camera's frame,
    optionally scaling the scene to unit average point distance.

    Args:
        extrinsics: (B, S, 3, 4) w2c.
    Returns:
        (extrinsics (B,S,3,4), cam_points, world_points, depths) normalized.
    Reference parity: aligned_vggt/utils/data.py:241-335 — note both call
    sites use scale_by_points=False (run_model.py:170,
    training_metrics.py:600)."""
    e = pad_to_4x4(extrinsics.astype(jnp.float32))
    first_inv = closed_form_inverse_se3(e[:, 0])
    new_e = e @ first_inv[:, None]

    new_world = None
    if world_points is not None:
        R = e[:, 0, :3, :3]
        t = e[:, 0, :3, 3]
        new_world = (
            jnp.einsum("bij,bshwj->bshwi", R, world_points.astype(jnp.float32))
            + t[:, None, None, None, :]
        )

    if scale_by_points:
        assert world_points is not None and point_masks is not None
        dist = jnp.linalg.norm(new_world, axis=-1)
        m = point_masks.astype(jnp.float32)
        avg = (jnp.sum(dist * m, axis=(1, 2, 3)) /
               (jnp.sum(m, axis=(1, 2, 3)) + 1e-3)).clip(1e-6, 1e6)
        new_world = new_world / avg[:, None, None, None, None]
        new_e = new_e.at[:, :, :3, 3].divide(avg[:, None, None])
        if depths is not None:
            depths = depths / avg[:, None, None, None]
        if cam_points is not None:
            cam_points = cam_points / avg[:, None, None, None, None]
        new_e3 = check_and_fix_inf_nan(new_e[:, :, :3])
        return new_e3, cam_points, check_and_fix_inf_nan(new_world), depths

    return new_e[:, :, :3], cam_points, new_world, depths

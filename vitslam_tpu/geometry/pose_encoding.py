"""Camera pose encodings, pure jnp fp32.

Two encodings are used across the framework:

* **7-d** ``[t(3), quat_xyzw(4)]`` — used by the AlignmentHead outputs and
  overlap-pose averaging. Reference parity:
  aligned_vggt/utils/data.py:12-52 (extri_to_pose_encoding /
  pose_encoding_to_extri).
* **9-d absT_quaR_FoV** ``[t(3), quat_xyzw(4), fov_h, fov_w]`` — the VGGT
  CameraHead encoding. Reference parity: vggt.utils.pose_enc
  (extri_intri_to_pose_encoding / pose_encoding_to_extri_intri, imported at
  aligned_vggt/models/featureAligned_vggt.py:9).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotations import mat_to_quat, normalize_quat, quat_to_mat
from .se3 import pad_to_4x4


def extri_to_pose_encoding(extrinsics: jax.Array) -> jax.Array:
    """(..., 3, 4) or (..., 4, 4) w2c -> (..., 7) [t, quat_xyzw]."""
    e = extrinsics.astype(jnp.float32)
    quat = normalize_quat(mat_to_quat(e[..., :3, :3]))
    return jnp.concatenate([e[..., :3, 3], quat], axis=-1)


def pose_encoding_to_extri(pose_encoding: jax.Array) -> jax.Array:
    """(..., 7) [t, quat_xyzw] -> (..., 4, 4) homogeneous w2c."""
    pe = pose_encoding.astype(jnp.float32)
    t = pe[..., :3]
    quat = normalize_quat(pe[..., 3:7])
    R = quat_to_mat(quat)
    extr = jnp.concatenate([R, t[..., None]], axis=-1)
    return pad_to_4x4(extr)


def extri_intri_to_pose_encoding(
    extrinsics: jax.Array,
    intrinsics: jax.Array | None,
    image_size_hw: tuple[int, int] | None = None,
) -> jax.Array:
    """(B, S, 3, 4) w2c + (B, S, 3, 3) K -> (B, S, 9) absT_quaR_FoV.

    FoV from focal lengths: fov_h = 2*atan(H / (2 fy)), fov_w likewise with
    fx. If ``intrinsics`` is None, the FoV slots are zero.
    """
    e = extrinsics.astype(jnp.float32)
    t = e[..., :3, 3]
    quat = normalize_quat(mat_to_quat(e[..., :3, :3]))
    if intrinsics is None:
        fov = jnp.zeros(e.shape[:-2] + (2,), dtype=jnp.float32)
    else:
        k = intrinsics.astype(jnp.float32)
        H, W = image_size_hw
        fov_h = 2.0 * jnp.arctan((H / 2.0) / k[..., 1, 1])
        fov_w = 2.0 * jnp.arctan((W / 2.0) / k[..., 0, 0])
        fov = jnp.stack([fov_h, fov_w], axis=-1)
    return jnp.concatenate([t, quat, fov], axis=-1)


def pose_encoding_to_extri_intri(
    pose_encoding: jax.Array,
    image_size_hw: tuple[int, int],
    build_intrinsics: bool = True,
) -> tuple[jax.Array, jax.Array | None]:
    """(B, S, 9) absT_quaR_FoV -> ((B, S, 3, 4) w2c, (B, S, 3, 3) K or None).

    Principal point at the image center.
    """
    pe = pose_encoding.astype(jnp.float32)
    t = pe[..., :3]
    quat = normalize_quat(pe[..., 3:7])
    R = quat_to_mat(quat)
    extr = jnp.concatenate([R, t[..., None]], axis=-1)
    intr = None
    if build_intrinsics:
        H, W = image_size_hw
        fov_h, fov_w = pe[..., 7], pe[..., 8]
        fy = (H / 2.0) / jnp.tan(fov_h / 2.0).clip(1e-6)
        fx = (W / 2.0) / jnp.tan(fov_w / 2.0).clip(1e-6)
        zeros = jnp.zeros_like(fx)
        ones = jnp.ones_like(fx)
        intr = jnp.stack(
            [
                jnp.stack([fx, zeros, jnp.full_like(fx, W / 2.0)], axis=-1),
                jnp.stack([zeros, fy, jnp.full_like(fy, H / 2.0)], axis=-1),
                jnp.stack([zeros, zeros, ones], axis=-1),
            ],
            axis=-2,
        )
    return extr, intr


def average_pose_encodings(pose_encodings: jax.Array) -> jax.Array:
    """Average 7-d pose encodings: mean translation + Markley quaternion mean.

    Args:
        pose_encodings: (B, N, 7).
    Returns:
        (B, 1, 7).
    Reference parity: aligned_vggt/utils/geometry.py:4-37 (averagePoseEncodings).
    """
    from .rotations import average_quaternions

    pe = pose_encodings.astype(jnp.float32)
    avg_t = jnp.mean(pe[..., :3], axis=1, keepdims=True)
    avg_q = average_quaternions(pe[..., 3:7])[:, None, :]
    return jnp.concatenate([avg_t, avg_q], axis=-1)

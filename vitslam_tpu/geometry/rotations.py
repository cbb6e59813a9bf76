"""Quaternion / rotation-matrix math, pure jnp.

Quaternion convention throughout the framework: **xyzw** (scalar last),
matching the reference's convention (reference: aligned_vggt/utils/data.py:6,
training/loss.py:374 — w is index -1).

All functions are fp32, shape-polymorphic over leading batch dims, and
jit/vmap friendly (no data-dependent Python control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_mat(quat: jax.Array) -> jax.Array:
    """Convert unit quaternions (..., 4) xyzw to rotation matrices (..., 3, 3).

    Reference parity: vggt.utils.rotation.quat_to_mat (used at
    aligned_vggt/utils/data.py:6).
    """
    quat = quat.astype(jnp.float32)
    x, y, z, w = jnp.moveaxis(quat, -1, 0)
    # Normalize defensively; a zero quaternion maps to identity-ish garbage,
    # callers are expected to pass near-unit quats.
    n2 = x * x + y * y + z * z + w * w
    s = 2.0 / jnp.maximum(n2, 1e-12)
    xs, ys, zs = x * s, y * s, z * s
    wx, wy, wz = w * xs, w * ys, w * zs
    xx, xy, xz = x * xs, x * ys, x * zs
    yy, yz, zz = y * ys, y * zs, z * zs
    m = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    # where-guarded so the VJP is 0 (not 0/0=NaN) on the clipped branch:
    # sqrt(max(x,0)) would propagate NaN through zero cotangents at x<=0.
    positive = x > 0
    return jnp.where(positive, jnp.sqrt(jnp.where(positive, x, 1.0)), 0.0)


def mat_to_quat(matrix: jax.Array) -> jax.Array:
    """Convert rotation matrices (..., 3, 3) to quaternions (..., 4) xyzw.

    Branchless, numerically robust candidate-selection algorithm (selects
    the quaternion candidate with the largest diagonal trace term).
    Sign-canonicalized so w >= 0.
    """
    m = matrix.astype(jnp.float32)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    # Candidate quaternions in wxyz order, row k assumes q_abs[k] is largest.
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    flr = jnp.asarray(0.1, jnp.float32)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    quat_wxyz = jnp.take_along_axis(
        quat_candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    quat_wxyz = quat_wxyz / jnp.linalg.norm(quat_wxyz, axis=-1, keepdims=True).clip(1e-8)
    # wxyz -> xyzw, canonical sign w >= 0
    quat = jnp.concatenate([quat_wxyz[..., 1:], quat_wxyz[..., :1]], axis=-1)
    return jnp.where(quat[..., 3:4] < 0, -quat, quat)


def normalize_quat(quat: jax.Array, eps: float = 1e-8) -> jax.Array:
    return quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(eps)


def average_quaternions(quats: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Markley quaternion mean: dominant eigenvector of the weighted outer-
    product matrix M = sum_i w_i q_i q_i^T.

    Args:
        quats: (..., N, 4) xyzw quaternions.
        weights: optional (..., N); defaults to uniform.
    Returns:
        (..., 4) average quaternion (unit, arbitrary global sign as returned
        by eigh — matching reference aligned_vggt/utils/geometry.py:25-36).
    """
    q = normalize_quat(quats.astype(jnp.float32))
    n = q.shape[-2]
    if weights is None:
        weights = jnp.full(q.shape[:-1], 1.0 / n, dtype=jnp.float32)
    else:
        weights = weights.astype(jnp.float32)
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True).clip(1e-12)
    m = jnp.einsum("...n,...ni,...nj->...ij", weights, q, q)
    _, eigvecs = jnp.linalg.eigh(m)
    avg = eigvecs[..., -1]  # eigenvector of the largest eigenvalue
    return avg / jnp.linalg.norm(avg, axis=-1, keepdims=True).clip(1e-8)


def rotation_angle(R: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Geodesic rotation angle (radians) of rotation matrices (..., 3, 3):
    acos((trace(R) - 1) / 2), clipped for numerical stability.

    Reference parity: eval/trajectory_metrics.py:169-179 (RPE rotation error).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(cos)

"""SE(3) / Sim(3) transform utilities, pure jnp fp32.

Reference parity: vggt.utils.geometry.closed_form_inverse_se3 (imported at
aligned_vggt/models/featureAligned_vggt.py:10), aligned_vggt/utils/geometry.py
(compute_relative_poses:107), aligned_vggt/utils/alignment.py appliers
(apply_sim3_alignment_on_w2c:528, _on_c2w:558, _on_point_maps:491).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_to_4x4(mats: jax.Array) -> jax.Array:
    """Pad (..., 3, 4) transforms to homogeneous (..., 4, 4). Pass-through
    for inputs already (..., 4, 4)."""
    if mats.shape[-2] == 4:
        return mats
    bottom = jnp.zeros(mats.shape[:-2] + (1, 4), dtype=mats.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([mats, bottom], axis=-2)


def closed_form_inverse_se3(se3: jax.Array) -> jax.Array:
    """Invert SE(3) transforms in closed form: inv([R t]) = [R^T  -R^T t].

    Accepts (..., 3, 4) or (..., 4, 4); returns (..., 4, 4).
    Reference parity: vggt.utils.geometry.closed_form_inverse_se3.
    """
    se3 = se3.astype(jnp.float32)
    R = se3[..., :3, :3]
    t = se3[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -Rt @ t
    top = jnp.concatenate([Rt, t_inv], axis=-1)
    return pad_to_4x4(top)


def se3_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose homogeneous transforms a @ b with 3x4 auto-padding."""
    return pad_to_4x4(a) @ pad_to_4x4(b)


def compute_relative_poses(extrinsics: jax.Array, offset: int = 1, to_next: bool = True) -> jax.Array:
    """Relative poses between frames offset apart.

    Args:
        extrinsics: (B, S, 3, 4) or (B, S, 4, 4) world-to-camera.
        offset: frame offset.
        to_next: if True, rel maps frame s -> s+offset (w2c_{s+o} @ c2w_s).
    Returns:
        (B, S-offset, 3, 4) relative transforms.
    Reference parity: aligned_vggt/utils/geometry.py:107-140.
    """
    w2c = pad_to_4x4(extrinsics.astype(jnp.float32))
    c2w = closed_form_inverse_se3(w2c)
    if to_next:
        rel = w2c[:, offset:] @ c2w[:, :-offset]
    else:
        rel = w2c[:, :-offset] @ c2w[:, offset:]
    return rel[..., :3, :4]


def apply_sim3_on_c2w(poses: jax.Array, transform: jax.Array, scale: jax.Array) -> jax.Array:
    """Apply a Sim(3) = (transform SE(3), scale) to camera-to-world poses:
    scale translations, then left-multiply by the transform.

    Args:
        poses: (B, S, 4, 4) or (B, S, 3, 4) c2w.
        transform: (B, 4, 4) rigid transform.
        scale: (B,) scale factor.
    Reference parity: aligned_vggt/utils/alignment.py:558-594.
    """
    poses = pad_to_4x4(poses.astype(jnp.float32))
    B = poses.shape[0]
    scaled_t = poses[..., :3, 3] * scale.reshape(B, 1, 1)
    poses = poses.at[..., :3, 3].set(scaled_t)
    return transform[:, None].astype(jnp.float32) @ poses


def apply_sim3_on_w2c(extr: jax.Array, transform: jax.Array, scale: jax.Array) -> jax.Array:
    """Apply Sim(3) to world-to-camera extrinsics by round-tripping through
    c2w: w2c' = inv(T @ scale(c2w)).

    Args:
        extr: (B, S, 3, 4) w2c. Returns (B, S, 4, 4).
    Reference parity: aligned_vggt/utils/alignment.py:528-556.
    """
    c2w = closed_form_inverse_se3(pad_to_4x4(extr.astype(jnp.float32)))
    c2w = apply_sim3_on_c2w(c2w, transform, scale)
    return closed_form_inverse_se3(c2w)


def apply_sim3_on_point_maps(point_maps: jax.Array, transform: jax.Array, scale: jax.Array) -> jax.Array:
    """Apply Sim(3) to point maps (B, S, H, W, 3): scale then rigid transform.

    Reference parity: aligned_vggt/utils/alignment.py:491-526.
    """
    pts = point_maps.astype(jnp.float32)
    B = pts.shape[0]
    bshape = (B,) + (1,) * (pts.ndim - 2)
    pts = pts * scale.reshape(bshape + (1,))
    R = transform[:, :3, :3].astype(jnp.float32)
    t = transform[:, :3, 3].astype(jnp.float32)
    out = jnp.einsum("bij,b...j->b...i", R, pts) + t.reshape(bshape + (3,))
    return out

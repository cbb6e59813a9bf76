"""Camera projection / unprojection, pure jnp fp32.

Reference parity: aligned_vggt/utils/geometry.py:39-157
(unproject_depth_map_to_point_map, project_world_points_to_pixels,
generate_3D_pixel_grid).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import closed_form_inverse_se3


def generate_pixel_grid(H: int, W: int) -> jax.Array:
    """(H, W, 3) homogeneous pixel coordinates (u, v, 1) with xy indexing."""
    u = jnp.arange(W, dtype=jnp.float32)
    v = jnp.arange(H, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1)


def unproject_depth_to_points(
    depth_map: jax.Array, extrinsics: jax.Array, intrinsics: jax.Array
) -> jax.Array:
    """Unproject depth maps to world-space point maps.

    Args:
        depth_map: (B, S, H, W, 1) or (B, S, H, W) camera-space depths.
        extrinsics: (B, S, 3, 4) world-to-camera.
        intrinsics: (B, S, 3, 3).
    Returns:
        (B, S, H, W, 3) world coordinates.
    Reference parity: aligned_vggt/utils/geometry.py:39-76.
    """
    if depth_map.ndim == 5:
        depth_map = depth_map[..., 0]
    depth_map = depth_map.astype(jnp.float32)
    B, S, H, W = depth_map.shape
    pix = generate_pixel_grid(H, W).reshape(-1, 3)  # (HW, 3)
    k_inv = jnp.linalg.inv(intrinsics.astype(jnp.float32))  # (B, S, 3, 3)
    rays = jnp.einsum("bsij,nj->bsni", k_inv, pix)  # (B, S, HW, 3)
    cam = rays * depth_map.reshape(B, S, -1, 1)
    c2w = closed_form_inverse_se3(extrinsics.astype(jnp.float32))  # (B, S, 4, 4)
    world = jnp.einsum("bsij,bsnj->bsni", c2w[..., :3, :3], cam) + c2w[..., None, :3, 3]
    return world.reshape(B, S, H, W, 3)


def project_points_to_pixels(
    world_points: jax.Array, extrinsics: jax.Array, intrinsics: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Project world points to homogeneous pixel coordinates, keeping the
    signed depth coordinate so behind-camera points can be penalized.

    Args:
        world_points: (B, S, H, W, 3).
        extrinsics: (B, S, 3, 4) w2c.
        intrinsics: (B, S, 3, 3).
    Returns:
        pixels (B, S, H, W, 3) as (u, v, signed w) with u, v divided by |w|
        for valid points; valid_mask (B, S, H, W) for 1e-8 < |w| < 100.
    Reference parity: aligned_vggt/utils/geometry.py:77-105.
    """
    wp = world_points.astype(jnp.float32)
    B, S, H, W, _ = wp.shape
    e = extrinsics.astype(jnp.float32)
    cam = jnp.einsum("bsij,bshwj->bshwi", e[..., :3, :3], wp) + e[..., None, None, :3, 3]
    pix = jnp.einsum("bsij,bshwj->bshwi", intrinsics.astype(jnp.float32), cam)
    absw = jnp.abs(pix[..., 2])
    valid = (absw > 1e-8) & (absw < 100.0)
    denom = jnp.where(valid, absw, 1.0)[..., None]
    pix = jnp.where(valid[..., None], pix / denom, pix)
    return pix, valid

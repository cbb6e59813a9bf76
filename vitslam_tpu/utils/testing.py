"""Synthetic fixtures: tiny model configs and geometrically-consistent fake
driving batches (the test-time stand-in for VKITTI; SURVEY.md §4 / §7.6)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..geometry import unproject_depth_to_points

TINY = dict(
    img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=4,
    patch_embed_depth=1, intermediate_layers=(0, 1, 1, 1), dtype=jnp.float32,
)


def tiny_model_kwargs(**overrides) -> dict:
    kw = dict(TINY)
    kw.update(overrides)
    return kw


def make_synthetic_batch(B=1, N=8, H=28, W=42, seed=0, f=30.0):
    """A geometrically consistent batch: a camera translating along +z
    through a synthetic scene, with GT extrinsics/intrinsics/depths/world
    points/masks shaped like the dataset output contract (SURVEY.md §2.6)."""
    rng = np.random.default_rng(seed)
    images = rng.uniform(0, 1, size=(B, N, 3, H, W)).astype(np.float32)

    extr = np.zeros((B, N, 3, 4), np.float32)
    for s in range(N):
        # w2c: camera moves along +z, slight yaw
        a = 0.02 * s
        R = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
            np.float32,
        )
        t = np.array([0.05 * s, 0.0, -0.5 * s], np.float32)
        extr[:, s, :3, :3] = R
        extr[:, s, :3, 3] = t

    K = np.zeros((B, N, 3, 3), np.float32)
    K[:, :, 0, 0] = f
    K[:, :, 1, 1] = f
    K[:, :, 0, 2] = W / 2
    K[:, :, 1, 2] = H / 2
    K[:, :, 2, 2] = 1.0

    depths = rng.uniform(2.0, 20.0, size=(B, N, H, W)).astype(np.float32)
    world_points = np.asarray(
        unproject_depth_to_points(jnp.asarray(depths), jnp.asarray(extr), jnp.asarray(K))
    )
    point_masks = rng.uniform(size=(B, N, H, W)) > 0.1

    return {
        "images": images,
        "extrinsics": extr,
        "intrinsics": K,
        "depths": depths,
        "world_points": world_points,
        "point_masks": point_masks.astype(np.float32),
    }

"""Brute-force nearest-neighbor search, tiled for TPU memory.

Replaces PyTorch3D's CUDA ``knn_points`` (reference import
eval/reconstruction_metrics.py:4). After the eval pipeline's subsampling the
clouds are <= 500k points (SURVEY.md §2.9b), so brute force on the MXU via
the |p|^2 + |q|^2 - 2 p.q expansion is both exact and fast; tiles bound the
distance-matrix working set.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_to(x: jax.Array, n: int, fill: float) -> jax.Array:
    if x.shape[0] == n:
        return x
    pad = jnp.full((n - x.shape[0],) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0)


@functools.partial(jax.jit, static_argnames=("tile_p", "tile_q", "norm"))
def nn_search(
    p: jax.Array,
    q: jax.Array,
    tile_p: int = 1024,
    tile_q: int = 65536,
    norm: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """For every point in p (N, 3), the squared L2 (or L1) distance to, and
    index of, its nearest neighbor in q (M, 3).

    Returns (dists (N,), indices (N,)); dists are squared for norm=2
    (matching pytorch3d knn_points.dists semantics).
    """
    n, d = p.shape
    m = q.shape[0]
    np_pad = -(-n // tile_p) * tile_p
    mq_pad = -(-m // tile_q) * tile_q
    pp = _pad_to(p.astype(jnp.float32), np_pad, 0.0)
    qq = _pad_to(q.astype(jnp.float32), mq_pad, jnp.inf)

    q_tiles = qq.reshape(mq_pad // tile_q, tile_q, d)

    def per_p_tile(p_tile):
        # p_tile (tile_p, d); scan over q tiles keeping running min
        def body(carry, args):
            best_d, best_i = carry
            q_tile, q_off = args
            if norm == 2:
                d2 = (
                    jnp.sum(p_tile ** 2, -1, keepdims=True)
                    + jnp.sum(q_tile ** 2, -1)[None]
                    - 2.0 * p_tile @ q_tile.T
                )
            else:
                d2 = jnp.sum(
                    jnp.abs(p_tile[:, None, :] - q_tile[None, :, :]), axis=-1
                )
            d2 = jnp.nan_to_num(d2, nan=jnp.inf, posinf=jnp.inf)
            tile_best = jnp.min(d2, axis=1)
            tile_idx = jnp.argmin(d2, axis=1) + q_off
            take = tile_best < best_d
            return (
                jnp.where(take, tile_best, best_d),
                jnp.where(take, tile_idx, best_i),
            ), None

        offs = jnp.arange(q_tiles.shape[0]) * tile_q
        init = (
            jnp.full((p_tile.shape[0],), jnp.inf, jnp.float32),
            jnp.zeros((p_tile.shape[0],), jnp.int32),
        )
        (best_d, best_i), _ = jax.lax.scan(body, init, (q_tiles, offs))
        return best_d, best_i

    p_tiles = pp.reshape(np_pad // tile_p, tile_p, d)
    dists, idx = jax.lax.map(per_p_tile, p_tiles)
    dists = dists.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n]
    if norm == 2:
        dists = jnp.maximum(dists, 0.0)  # clamp fp cancellation noise
    return dists, idx


def nn_dists(p: jax.Array, q: jax.Array, norm: int = 2) -> jax.Array:
    """Nearest-neighbor distances only (squared for norm=2)."""
    return nn_search(p, q, norm=norm)[0]

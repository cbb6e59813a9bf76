"""Rotary position embeddings (1-D and 2-D), functional jnp.

Convention (matches the reference's behavior, aligned_vggt/layers/rope.py:
44-75): for head dim D there are D/2 frequency bands
``1 / base**(2i/D)``; the angle vector is duplicated across both halves and
the rotation is the half-split ``(-x2, x1)`` form:

    out = x * cos(theta) + [-x2, x1] * sin(theta)

The 2-D variant (VGGT ``RotaryPositionEmbedding2D``; SURVEY.md §2.9a) splits
the head dim into two halves and applies 1-D RoPE with the row positions to
the first half and the column positions to the second half.

Unlike the reference's per-(dim, seqlen, device) cos/sin cache + embedding
gather, these are pure functions of integer position arrays — XLA constant-
folds the trig for static positions and fuses the elementwise rotation into
neighboring ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _rope_angles(positions: jax.Array, dim: int, base: float) -> tuple[jax.Array, jax.Array]:
    """cos/sin of shape positions.shape + (dim,) with duplicated bands."""
    half = dim // 2
    exponents = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    inv_freq = 1.0 / (base ** exponents)  # (half,)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., half)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (..., dim)
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope_1d(tokens: jax.Array, positions: jax.Array, base: float = 100.0) -> jax.Array:
    """Apply 1-D RoPE.

    Args:
        tokens: (B, H, N, D) with D even.
        positions: (B, N) integer positions.
    Returns:
        (B, H, N, D), computed in fp32 and cast back to tokens.dtype.
    """
    d = tokens.shape[-1]
    cos, sin = _rope_angles(positions, d, base)  # (B, N, D)
    cos = cos[:, None]  # broadcast over heads
    sin = sin[:, None]
    x = tokens.astype(jnp.float32)
    out = x * cos + _rotate_half(x) * sin
    return out.astype(tokens.dtype)


def apply_rope_2d(tokens: jax.Array, positions: jax.Array, base: float = 100.0) -> jax.Array:
    """Apply 2-D RoPE: first half of the head dim rotated by row (y)
    positions, second half by column (x) positions.

    Args:
        tokens: (B, H, N, D) with D divisible by 4.
        positions: (B, N, 2) integer (row, col) grid positions.
    Returns:
        (B, H, N, D).
    """
    d = tokens.shape[-1]
    assert d % 4 == 0, "2-D RoPE needs head dim divisible by 4"
    half = d // 2
    x = tokens.astype(jnp.float32)
    y_part, x_part = x[..., :half], x[..., half:]
    cos_y, sin_y = _rope_angles(positions[..., 0], half, base)
    cos_x, sin_x = _rope_angles(positions[..., 1], half, base)
    y_out = y_part * cos_y[:, None] + _rotate_half(y_part) * sin_y[:, None]
    x_out = x_part * cos_x[:, None] + _rotate_half(x_part) * sin_x[:, None]
    return jnp.concatenate([y_out, x_out], axis=-1).astype(tokens.dtype)


@jax.tree_util.register_static
class StaticDim(int):
    """An int that rides pytrees as STATIC aux data. The rope-cache nsplit
    must remain a Python int through nn.remat / jax.checkpoint boundaries:
    as an ordinary tuple leaf it would be traced to an array, defeating
    both the static split in apply_rope_cached and the cache detection in
    nn.layers._is_rope_cache (isinstance(..., int) still holds — this is
    an int subclass)."""


def rope_cache_1d(positions: jax.Array, dim: int, base: float = 100.0):
    """Precompute (cos, sin, nsplit=1) for 1-D RoPE — hoist the trig out of
    hot loops (e.g. computed once per forward instead of per scanned layer)."""
    cos, sin = _rope_angles(positions, dim, base)
    return cos, sin, StaticDim(1)


def rope_cache_2d(positions: jax.Array, dim: int, base: float = 100.0):
    """Precompute (cos, sin, nsplit=2) for 2-D RoPE: the first half of the
    head dim carries the row-angle bands, the second half the column-angle
    bands."""
    half = dim // 2
    cos_y, sin_y = _rope_angles(positions[..., 0], half, base)
    cos_x, sin_x = _rope_angles(positions[..., 1], half, base)
    return (jnp.concatenate([cos_y, cos_x], axis=-1),
            jnp.concatenate([sin_y, sin_x], axis=-1), StaticDim(2))


def _rotate_half_multi(x: jax.Array, nsplit: int) -> jax.Array:
    """Half-rotation applied independently within each of ``nsplit``
    contiguous blocks of the last dim."""
    if nsplit == 1:
        return _rotate_half(x)
    d = x.shape[-1]
    xs = x.reshape(x.shape[:-1] + (nsplit, d // nsplit))
    half = d // nsplit // 2
    rot = jnp.concatenate([-xs[..., half:], xs[..., :half]], axis=-1)
    return rot.reshape(x.shape)


def apply_rope_cached(tokens: jax.Array, cache) -> jax.Array:
    """Apply RoPE from a precomputed (cos, sin, nsplit) cache.
    tokens (B, H, N, D); cos/sin (B, N, D)."""
    cos, sin, nsplit = cache
    x = tokens.astype(jnp.float32)
    out = x * cos[:, None] + _rotate_half_multi(x, nsplit) * sin[:, None]
    return out.astype(tokens.dtype)


import functools

import numpy as np


@functools.lru_cache(maxsize=8)
def rope_rotation_matrix(head_dim: int, nsplit: int, num_heads: int) -> np.ndarray:
    """(C, C) constant +-1 permutation matrix P such that ``x @ P`` equals
    per-head ``_rotate_half_multi`` in the flat (..., num_heads*head_dim)
    layout. Lane permutations are gathers on the VPU; as a matmul they ride
    the MXU instead, keeping the fused qk-norm+RoPE path free of relayouts
    (the whole point of the flat-layout attention prep)."""
    dh, h = head_dim, num_heads
    s = dh // nsplit
    half = s // 2
    C = h * dh
    P = np.zeros((C, C), np.float32)
    for j in range(h):
        for b in range(nsplit):
            base = j * dh + b * s
            for t in range(half):
                # out[base+t] = -x[base+half+t];  out[base+half+t] = x[base+t]
                P[base + half + t, base + t] = -1.0
                P[base + t, base + half + t] = 1.0
    return P


def apply_rope_flat(x: jax.Array, cos: jax.Array, sin: jax.Array,
                    num_heads: int, nsplit: int) -> jax.Array:
    """RoPE in the flat (B, N, num_heads*head_dim) layout: every head uses
    the same (B, N, head_dim) cos/sin (tiled across lanes), and the
    half-rotation is the constant lane-permutation matmul above. Numerics
    are identical to apply_rope_cached on the (B, H, N, D) layout."""
    B, N, C = x.shape
    dh = C // num_heads
    if cos.shape[-1] == dh:  # un-tiled cache
        cos = jnp.tile(cos, (1, 1, num_heads))
        sin = jnp.tile(sin, (1, 1, num_heads))
    P = jnp.asarray(rope_rotation_matrix(dh, nsplit, num_heads), x.dtype)
    return x * cos.astype(x.dtype) + (x @ P) * sin.astype(x.dtype)


def patch_grid_positions(batch: int, grid_h: int, grid_w: int, num_special: int) -> jax.Array:
    """(B, num_special + grid_h*grid_w, 2) integer positions: special tokens
    at (0, 0), patch tokens on the (row+1, col+1) grid.

    Reference parity: VGGT PositionGetter + the +1 shift for special tokens
    (aligned_vggt/heads/alignment_head.py:289-310).
    """
    rows = jnp.repeat(jnp.arange(1, grid_h + 1), grid_w)
    cols = jnp.tile(jnp.arange(1, grid_w + 1), grid_h)
    grid = jnp.stack([rows, cols], axis=-1)  # (P, 2)
    special = jnp.zeros((num_special, 2), dtype=grid.dtype)
    pos = jnp.concatenate([special, grid], axis=0)
    return jnp.broadcast_to(pos, (batch,) + pos.shape)

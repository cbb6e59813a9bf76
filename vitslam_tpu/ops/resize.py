"""Bilinear resize as MXU matmuls.

`jax.image.resize(..., "bilinear")` lowers to gather/scatter chains that run
on the VPU and dominate the DPT head's full-resolution decode. Bilinear
interpolation is a *linear* map, so resizing (B, H, W, C) to (B, H', W') is
exactly `W_h @ x @ W_w^T` with two precomputed sparse-in-rows weight
matrices — dense (H', H) / (W', W) matmuls that ride the MXU instead.

Matches jax.image.resize semantics (half-pixel centers, edge clamp) to fp
tolerance; used by the DPT head (reference DPTHead interpolation sites —
SURVEY.md §2.9a) and anywhere else feature maps are rescaled on device.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(
    out_size: int, in_size: int, align_corners: bool = False
) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation weights.

    align_corners=False: half-pixel centers — jax.image.resize's convention,
    including its antialiasing on downscale (triangle widened to the scale).
    align_corners=True: endpoint-pinned grid — torch
    ``F.interpolate(..., align_corners=True)``'s convention (no antialias),
    which is what the reference's DPT fusion upsampling uses."""
    if out_size == in_size:
        return np.eye(out_size, dtype=np.float32)
    j = np.arange(in_size, dtype=np.float64)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = np.arange(out_size, dtype=np.float64) * scale
        width = 1.0
    else:
        scale = in_size / out_size
        width = max(scale, 1.0)  # antialias: widen support when downscaling
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    w = np.maximum(0.0, 1.0 - np.abs(src[:, None] - j[None, :]) / width)
    w /= w.sum(axis=1, keepdims=True)
    return w.astype(np.float32)


def resize_bilinear_nhwc(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = False
) -> jnp.ndarray:
    """Resize (..., H, W, C) to (..., out_h, out_w, C) bilinearly via two
    MXU matmuls. Compute dtype follows x (weights are cast)."""
    h, w = x.shape[-3], x.shape[-2]
    if h == out_h and w == out_w:
        return x
    wh = jnp.asarray(_bilinear_matrix(out_h, h, align_corners), x.dtype)
    ww = jnp.asarray(_bilinear_matrix(out_w, w, align_corners), x.dtype)
    # (..., H, W, C): contract H then W
    x = jnp.einsum("oh,...hwc->...owc", wh, x)
    x = jnp.einsum("pw,...owc->...opc", ww, x)
    return x

"""TrackHead — CoTracker-style point tracking across the frames of a chunk.

Structure parity with VGGT's TrackHead (SURVEY.md §2.9a; import site
aligned_vggt/models/featureAligned_vggt.py:8,30 — instantiated by every
reference model but disabled in every shipped config): a DPT feature
extractor in ``feature_only`` mode at 1/2 resolution, a multi-level
correlation pyramid sampled in a (2r+1)^2 window around the current track
positions, and an iterative transformer updater with alternating
space (over tracks) / time (over frames) attention, predicting per-frame
track coordinates plus sigmoid visibility and confidence.

TPU-first notes: all loops are static (iters, pyramid levels), window
sampling is a batched bilinear gather with static window shapes, and the
updater reuses nn/layers.py::Block. The tracker's internal naming is our
own — the converter intentionally drops ``track_head.*`` checkpoint keys
(the reference never ships trained track weights).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import Block
from .dpt_head import DPTHead


def bilinear_sample(feat: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample (N, H, W, C) features at (N, M, 2) float (x, y) pixel coords."""
    N, H, W, C = feat.shape
    x = jnp.clip(coords[..., 0], 0.0, W - 1.001)
    y = jnp.clip(coords[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def gather(yy, xx):
        idx = yy * W + xx  # (N, M)
        flat = feat.reshape(N, H * W, C)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    f00 = gather(y0, x0)
    f01 = gather(y0, jnp.clip(x1, 0, W - 1))
    f10 = gather(jnp.clip(y1, 0, H - 1), x0)
    f11 = gather(jnp.clip(y1, 0, H - 1), jnp.clip(x1, 0, W - 1))
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    return top * (1 - wy) + bot * wy


def _sincos_embed(x: jax.Array, dim: int, max_freq: float = 64.0) -> jax.Array:
    """Per-coordinate sin/cos embedding of (..., 2) flow -> (..., dim)."""
    half = dim // 4  # freqs per coordinate per fn
    freqs = max_freq ** (jnp.arange(half, dtype=jnp.float32) / max(half - 1, 1))
    ang = x[..., None] * freqs  # (..., 2, half)
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return emb.reshape(x.shape[:-1] + (2 * 2 * half,))


class _UpdateFormer(nn.Module):
    """Alternating space/time attention over (B, S, N, hidden) track tokens
    (VGGT EfficientUpdateFormer shape; our Block internals)."""
    hidden: int
    depth: int = 3
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, S, N, Ch = x.shape
        for i in range(self.depth):
            xs = x.reshape(B * S, N, Ch)
            xs = Block(dim=Ch, num_heads=self.num_heads, qk_norm=False,
                       dtype=self.dtype, name=f"space_{i}")(xs)
            xt = xs.reshape(B, S, N, Ch).transpose(0, 2, 1, 3).reshape(
                B * N, S, Ch)
            xt = Block(dim=Ch, num_heads=self.num_heads, qk_norm=False,
                       dtype=self.dtype, name=f"time_{i}")(xt)
            x = xt.reshape(B, N, S, Ch).transpose(0, 2, 1, 3)
        return x


class TrackHead(nn.Module):
    dim_in: int = 2048
    patch_size: int = 14
    features: int = 128
    stride: int = 2
    iters: int = 4
    corr_levels: int = 4
    corr_radius: int = 3
    hidden_size: int = 384
    updater_depth: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        token_list: Sequence[jax.Array],
        images: jax.Array,
        patch_start_idx: int,
        query_points: jax.Array,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Track query points (given in pixel coords of frame 0) across S.

        Args:
            token_list: tapped aggregator layers (B, S, P_total, dim_in).
            images: (B, S, 3, H, W).
            query_points: (B, N, 2) (x, y) pixels in frame 0.
        Returns:
            tracks (B, S, N, 2) pixels, visibility (B, S, N),
            confidence (B, S, N).
        """
        B, S, _, H, W = images.shape
        fmaps = DPTHead(
            dim_in=self.dim_in, features=self.features,
            out_channels=(self.features, self.features * 2,
                          self.features * 4, self.features * 4),
            patch_size=self.patch_size, pos_embed=False, feature_only=True,
            down_ratio=self.stride, dtype=self.dtype,
            name="feature_extractor",
        )(token_list, images, patch_start_idx)  # (B, S, H2, W2, C)
        _, _, H2, W2, C = fmaps.shape
        fmaps = fmaps.astype(jnp.float32)
        fmaps = fmaps / jnp.linalg.norm(fmaps, axis=-1, keepdims=True).clip(1e-6)

        q = query_points.astype(jnp.float32) / self.stride  # fmap coords
        track_feat0 = bilinear_sample(fmaps[:, 0], q)  # (B, N, C)
        N = q.shape[1]

        # correlation pyramid (avg-pooled feature maps, static level count)
        pyramid = []
        fm = fmaps.reshape(B * S, H2, W2, C)
        for _ in range(self.corr_levels):
            pyramid.append(fm)
            fm = nn.avg_pool(fm, (2, 2), strides=(2, 2))

        r = self.corr_radius
        offs = jnp.stack(
            jnp.meshgrid(jnp.arange(-r, r + 1, dtype=jnp.float32),
                         jnp.arange(-r, r + 1, dtype=jnp.float32),
                         indexing="xy"),
            axis=-1,
        ).reshape(-1, 2)  # (K, 2)
        K = offs.shape[0]

        in_proj = nn.Dense(self.hidden_size, dtype=jnp.float32, name="in_proj")
        updater = _UpdateFormer(self.hidden_size, self.updater_depth,
                                dtype=jnp.float32, name="updater")
        out_proj = nn.Dense(2 + C, dtype=jnp.float32,
                            kernel_init=nn.initializers.zeros, name="out_proj")
        vis_head = nn.Dense(1, dtype=jnp.float32, name="vis_head")
        conf_head = nn.Dense(1, dtype=jnp.float32, name="conf_head")

        # CoTracker init: query positions replicated to every frame
        coords = jnp.broadcast_to(q[:, None], (B, S, N, 2))
        track_feat = jnp.broadcast_to(track_feat0[:, None], (B, S, N, C))
        x = None
        for _ in range(self.iters):
            coords = jax.lax.stop_gradient(coords)
            tf_flat = track_feat.reshape(B * S, N, C)
            corrs = []
            for lvl, f_l in enumerate(pyramid):
                c_l = coords.reshape(B * S, N, 2) / (2.0 ** lvl)
                win = c_l[:, :, None, :] + offs[None, None]  # (BS, N, K, 2)
                sampled = bilinear_sample(
                    f_l, win.reshape(B * S, N * K, 2)
                ).reshape(B * S, N, K, C)
                corrs.append(jnp.einsum("mnc,mnkc->mnk", tf_flat, sampled)
                             / jnp.sqrt(jnp.float32(C)))
            corr_cat = jnp.concatenate(corrs, axis=-1).reshape(
                B, S, N, self.corr_levels * K)
            flow = coords - coords[:, :1]  # displacement from the query frame
            flow_emb = _sincos_embed(flow / 16.0, 64)
            x = in_proj(jnp.concatenate(
                [corr_cat, flow_emb, track_feat], axis=-1))
            x = updater(x)
            out = out_proj(x)
            coords = coords + out[..., :2]
            track_feat = track_feat + out[..., 2:]

        visibility = jax.nn.sigmoid(vis_head(x)[..., 0])
        confidence = jax.nn.sigmoid(conf_head(x)[..., 0])
        return coords * self.stride, visibility, confidence

"""TrackHead — point tracking across the frames of a chunk.

The reference instantiates VGGT's CoTracker-style TrackHead but disables it
in every shipped config (SURVEY.md §2.9a: ``enable_track: False``). This is
a compact TPU-native equivalent that fills the same API slot: dense features
from the tapped aggregator layers, global correlation soft-argmax
initialization, and a fixed number of local-correlation refinement
iterations (static loop — XLA-friendly), predicting per-frame track
coordinates, visibility and confidence.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


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


class TrackHead(nn.Module):
    dim_in: int = 2048
    patch_size: int = 14
    feature_dim: int = 128
    iters: int = 4
    corr_radius: int = 3
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
            token_list: tapped aggregator layers, uses the last,
                (B, S, P_total, dim_in).
            images: (B, S, 3, H, W) for resolution.
            query_points: (B, N, 2) (x, y) pixels in frame 0.
        Returns:
            tracks (B, S, N, 2), visibility (B, S, N), confidence (B, S, N).
        """
        B, S, _, H, W = images.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        tokens = token_list[-1][:, :, patch_start_idx:, :].astype(self.dtype)
        feat = tokens.reshape(B * S, gh, gw, self.dim_in)
        feat = nn.Conv(self.feature_dim, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=jnp.float32, name="feat_conv")(feat)
        feat = feat / jnp.linalg.norm(
            feat.astype(jnp.float32), axis=-1, keepdims=True
        ).clip(1e-6).astype(self.dtype)
        feat = feat.reshape(B, S, gh, gw, self.feature_dim)

        scale = float(self.patch_size)
        q_grid = query_points.astype(jnp.float32) / scale  # grid coords
        qf = bilinear_sample(feat[:, 0], q_grid)  # (B, N, C)

        # global correlation soft-argmax initialization per frame
        corr = jnp.einsum("bnc,bshwc->bsnhw", qf.astype(jnp.float32),
                          feat.astype(jnp.float32))
        flat = corr.reshape(B, S, -1, gh * gw)
        attn = jax.nn.softmax(flat * 10.0, axis=-1)
        xs = jnp.arange(gw, dtype=jnp.float32)
        ys = jnp.arange(gh, dtype=jnp.float32)
        grid_x = jnp.tile(xs, gh)
        grid_y = jnp.repeat(ys, gw)
        track_x = attn @ grid_x
        track_y = attn @ grid_y
        tracks = jnp.stack([track_x, track_y], axis=-1)  # (B, S, N, 2) grid coords

        r = self.corr_radius
        offs = jnp.stack(
            jnp.meshgrid(
                jnp.arange(-r, r + 1, dtype=jnp.float32),
                jnp.arange(-r, r + 1, dtype=jnp.float32),
                indexing="xy",
            ),
            axis=-1,
        ).reshape(-1, 2)  # (K, 2)
        K = offs.shape[0]

        update = nn.Dense(64, dtype=jnp.float32, name="update_fc1")
        update2 = nn.Dense(2, dtype=jnp.float32,
                           kernel_init=nn.initializers.zeros, name="update_fc2")
        vis_head = nn.Dense(2, dtype=jnp.float32, name="vis_head")

        feat_flat = feat.reshape(B * S, gh, gw, self.feature_dim)
        qf_s = jnp.broadcast_to(qf[:, None], (B, S) + qf.shape[1:])
        qf_flat = qf_s.reshape(B * S, -1, self.feature_dim)
        local_corr = None
        for _ in range(self.iters):
            t_flat = tracks.reshape(B * S, -1, 2)
            # sample K offsets around each track
            coords = t_flat[:, :, None, :] + offs[None, None]  # (BS, N, K, 2)
            sampled = bilinear_sample(
                feat_flat, coords.reshape(B * S, -1, 2)
            ).reshape(B * S, -1, K, self.feature_dim)
            local_corr = jnp.einsum(
                "mnc,mnkc->mnk", qf_flat.astype(jnp.float32),
                sampled.astype(jnp.float32),
            )  # (BS, N, K)
            h = nn.relu(update(local_corr))
            delta = update2(h)
            tracks = tracks + delta.reshape(B, S, -1, 2)

        vis_conf = vis_head(local_corr).reshape(B, S, -1, 2)
        visibility = jax.nn.sigmoid(vis_conf[..., 0])
        confidence = jax.nn.sigmoid(vis_conf[..., 1])
        return tracks * scale, visibility, confidence

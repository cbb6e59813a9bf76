"""DPTHead — dense prediction (depth / point-map) decoder over the
aggregator's tapped token layers.

Behavior parity with VGGT's DPTHead (SURVEY.md §2.9a, import site
aligned_vggt/models/featureAligned_vggt.py:7,28-29): four tapped layers are
projected to a channel pyramid, resampled to four scales of the patch grid,
fused top-down through residual conv units, upsampled to pixel resolution
and decoded to ``output_dim`` channels — last channel is confidence.

Activations:
  * ``exp``      — positive map via exp (depth head, output_dim=2);
  * ``inv_log``  — sign(x) * expm1(|x|) (point head, output_dim=4);
  * ``linear``   — identity.
  * conf ``expp1`` — 1 + exp(x) (confidence >= 1); ``sigmoid`` supported.

TPU notes: all convs run in bf16 NHWC (fp32 params); resizes are bilinear
``jax.image.resize`` which XLA lowers to gathers/convs on device; the final
activation runs in fp32.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize(x: jax.Array, h: int, w: int) -> jax.Array:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


class ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, self.dtype, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, self.dtype, name="rcu2")(x)
        if out_hw is not None:
            x = _resize(x, *out_hw)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="out_conv")(x)
        return x


class DPTHead(nn.Module):
    dim_in: int = 2048
    output_dim: int = 4
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    activation: str = "inv_log"
    conf_activation: str = "expp1"
    patch_size: int = 14
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        token_list: Sequence[jax.Array],
        images: jax.Array,
        patch_start_idx: int,
    ) -> tuple[jax.Array, jax.Array]:
        """Decode tapped aggregator layers to dense maps.

        Args:
            token_list: 4 tensors (B, S, P_total, dim_in), shallow->deep.
            images: (B, S, 3, H, W) — for output resolution only.
            patch_start_idx: first patch-token index.
        Returns:
            (map (B, S, H, W, output_dim-1), conf (B, S, H, W)).
        """
        B, S, _, H, W = images.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        assert len(token_list) == 4, "DPTHead expects 4 tapped layers"

        # scales of the feature pyramid relative to the patch grid
        scales = (4.0, 2.0, 1.0, 0.5)
        feats = []
        for i, tokens in enumerate(token_list):
            t = tokens[:, :, patch_start_idx:, :].astype(self.dtype)
            t = t.reshape(B * S, gh, gw, self.dim_in)
            t = nn.Conv(self.out_channels[i], (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"project_{i}")(t)
            th = max(1, int(gh * scales[i]))
            tw = max(1, int(gw * scales[i]))
            t = _resize(t, th, tw)
            t = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"scratch_{i}")(t)
            feats.append(t)

        f0, f1, f2, f3 = feats  # f0 finest (4x), f3 coarsest (0.5x)
        y = FeatureFusionBlock(self.features, self.dtype, name="fusion_3")(
            f3, out_hw=(f2.shape[1], f2.shape[2])
        )
        y = FeatureFusionBlock(self.features, self.dtype, name="fusion_2")(
            y, skip=f2, out_hw=(f1.shape[1], f1.shape[2])
        )
        y = FeatureFusionBlock(self.features, self.dtype, name="fusion_1")(
            y, skip=f1, out_hw=(f0.shape[1], f0.shape[2])
        )
        y = FeatureFusionBlock(self.features, self.dtype, name="fusion_0")(y, skip=f0)

        y = nn.Conv(self.features // 2, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="head_conv1")(y)
        y = _resize(y, H, W)
        y = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="head_conv2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.output_dim, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32, name="head_out")(y)
        y = y.reshape(B, S, H, W, self.output_dim).astype(jnp.float32)

        raw_map, raw_conf = y[..., :-1], y[..., -1]
        if self.activation == "exp":
            out_map = jnp.exp(jnp.clip(raw_map, -30.0, 30.0))
        elif self.activation == "inv_log":
            out_map = jnp.sign(raw_map) * jnp.expm1(jnp.abs(raw_map).clip(max=30.0))
        elif self.activation == "linear":
            out_map = raw_map
        else:
            raise ValueError(f"unknown activation {self.activation!r}")

        if self.conf_activation == "expp1":
            conf = 1.0 + jnp.exp(jnp.clip(raw_conf, -30.0, 30.0))
        elif self.conf_activation == "sigmoid":
            conf = jax.nn.sigmoid(raw_conf)
        else:
            raise ValueError(f"unknown conf_activation {self.conf_activation!r}")
        return out_map, conf

"""Aggregator — the VGGT-style reconstruction transformer backbone.

Architecture (behavior parity with the public VGGT-1B aggregator the
reference depends on — SURVEY.md §2.9a, import site
aligned_vggt/models/featureAligned_vggt.py:5,25):

  * DINOv2-style ViT patch embedding (patch 14, embed 1024, own
    transformer depth — ViT-L/14 for the flagship, configurable down for
    tests), producing per-frame patch tokens;
  * 1 camera token + ``num_register_tokens`` register tokens prepended per
    frame, with distinct learned variants for the first frame vs the rest;
  * ``depth`` pairs of alternating attention blocks: **frame** attention
    (self-attention within each frame over P tokens, batched (B*S, P, C))
    then **global** attention (over all S*P tokens of the chunk, batched
    (B, S*P, C)), both with 2-D RoPE (base 100) where special tokens sit at
    grid position (0,0) and patches at (row+1, col+1);
  * per layer-pair output = concat(frame_out, global_out) -> (B, S, P, 2C).

TPU-first design choices:
  * layers run under ``lax.scan`` with stacked per-layer params — the 48
    attention blocks compile as ONE block body (orders-of-magnitude faster
    XLA compiles than unrolling; the reference's eager torch modules have no
    such constraint);
  * only the **tapped** intermediate layers (default [4, 11, 17, 23]) are
    materialized, accumulated in the scan carry — the reference materializes
    all 24 then frees (featureAligned_vggt.py:78-82, torch.cuda.empty_cache);
  * attention rides the Pallas flash kernel (ops.attention); the global
    attention over S*P ~ 27k tokens dominates FLOPs;
  * compute dtype bf16, params fp32; per-layer remat optional.
"""
from __future__ import annotations

import os
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import Block
from ..nn.rope import StaticDim, patch_grid_positions

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def expand_frame_tokens(param: jax.Array, B: int, S: int,
                        frame_offset=0) -> jax.Array:
    """Expand a (2, K, C) learned token param into (B*S, K, C) where the
    GLOBAL frame 0 uses variant 0 and all later frames use variant 1.

    ``frame_offset`` is the global index of local frame 0 (nonzero only
    under sequence parallelism, where each device holds an S-frame slice
    of the chunk). Behavior parity with the reference's
    slice_expand_and_flatten (aligned_vggt/heads/alignment_head.py:543-567)."""
    is_first = (jnp.arange(S) + frame_offset) == 0  # (S,)
    tokens = jnp.where(
        is_first[None, :, None, None], param[0][None, None],
        param[1][None, None],
    )  # (1, S, K, C)
    tokens = jnp.broadcast_to(tokens, (B, S) + param.shape[1:])
    return tokens.reshape(B * S, *param.shape[1:])


class _EmbedBlockScan(nn.Module):
    """One patch-embed transformer layer, scanned over depth."""
    dim: int
    num_heads: int
    mlp_ratio: float
    init_values: float
    dtype: jnp.dtype
    remat: bool

    @nn.compact
    def __call__(self, x, _):
        block_cls = nn.remat(Block) if self.remat else Block
        x = block_cls(
            dim=self.dim, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qk_norm=False, init_values=self.init_values, dtype=self.dtype,
            quant=True, fused_tail=True, name="block",
        )(x)
        return x, None


class PatchEmbedViT(nn.Module):
    """DINOv2 ViT patch embedding (structure parity with the vit_large/14
    backbone inside VGGT's aggregator, so real DINOv2 weights load 1:1):
    conv projection, a cls token + interpolated pos embedding, register
    tokens inserted after the cls token (DINOv2-with-registers ordering:
    registers get NO pos embedding), scanned transformer blocks over ALL
    tokens, final LayerNorm — returning the normed patch tokens only
    (DINOv2 ``x_norm_patchtokens``). ``depth=0`` -> pure conv projection
    (tiny test configs)."""
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    num_register_tokens: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images (N, 3, H, W) in [0, 1] -> (N, P, embed_dim)."""
        n, _, h, w = images.shape
        x = jnp.transpose(images, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype, param_dtype=jnp.float32, name="proj",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(n, gh * gw, self.embed_dim)

        ng = self.img_size // self.patch_size  # native pos-embed grid
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(stddev=0.02),
            (1, 1 + ng * ng, self.embed_dim), jnp.float32,
        )
        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1e-6),
            (1, 1, self.embed_dim), jnp.float32,
        )
        cls_pos, patch_pos = pos_embed[:, :1], pos_embed[:, 1:]
        if (gh, gw) != (ng, ng):
            # DINOv2 interpolate_pos_encoding (antialias=True, offset 0):
            # bicubic resample of the native grid to (gh, gw)
            patch_pos = jax.image.resize(
                patch_pos.reshape(ng, ng, self.embed_dim),
                (gh, gw, self.embed_dim), method="bicubic", antialias=True,
            ).reshape(1, gh * gw, self.embed_dim)
        x = x + patch_pos.astype(self.dtype)
        cls = jnp.broadcast_to((cls_token + cls_pos).astype(self.dtype),
                               (n, 1, self.embed_dim))
        parts = [cls]
        if self.num_register_tokens:
            reg = self.param(
                "register_tokens", nn.initializers.normal(stddev=1e-6),
                (1, self.num_register_tokens, self.embed_dim), jnp.float32,
            )
            parts.append(jnp.broadcast_to(
                reg.astype(self.dtype),
                (n, self.num_register_tokens, self.embed_dim)))
        x = jnp.concatenate(parts + [x], axis=1)

        if self.depth > 0:
            scan = nn.scan(
                _EmbedBlockScan,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.depth,
            )(self.embed_dim, self.num_heads, self.mlp_ratio,
              self.init_values, self.dtype, self.remat, name="blocks")
            x, _ = scan(x, None)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        return x[:, 1 + self.num_register_tokens:]


class _AggPairScan(nn.Module):
    """One frame-attention + global-attention layer pair, scanned over
    depth; accumulates the tapped concat outputs in the carry."""
    dim: int
    num_heads: int
    mlp_ratio: float
    qk_norm: bool
    init_values: float
    rope_base: float
    dtype: jnp.dtype
    remat: bool
    tap_layers: Sequence[int]
    depth: int
    B: int
    S: int
    seq_axis: str | None = None
    merge_pool: int = 0
    merge_stride: int = 1
    gh: int = 0
    gw: int = 0
    patch_start: int = 0

    def _merged_kv(self, x):
        """KV-compressed token set for global attention: anchor frames
        (every ``merge_stride``-th, incl. frame 0) contribute ALL their
        tokens; other frames contribute specials + ``merge_pool`` x
        ``merge_pool`` average-pooled patch tokens (edge-replicated to a
        pool multiple). Queries stay full resolution, so no unmerge is
        needed — only what tokens attend TO is approximated
        (FastVGGT/FlashVGGT-family KV compression, PAPERS.md; opt-in)."""
        B, S, C = self.B, self.S, self.dim
        T = x.shape[1]
        psi = self.patch_start
        pw = self.merge_pool
        x_bs = x.reshape(B, S, T, C)
        anchors = tuple(range(0, S, self.merge_stride))
        non = tuple(i for i in range(S) if i % self.merge_stride)
        anchor_tok = x_bs[:, anchors].reshape(B, len(anchors) * T, C)
        if not non:
            return anchor_tok
        xn = x_bs[:, non]
        spec = xn[:, :, :psi]
        patches = xn[:, :, psi:].reshape(B * len(non), self.gh, self.gw, C)
        patches = jnp.pad(
            patches,
            ((0, 0), (0, (-self.gh) % pw), (0, (-self.gw) % pw), (0, 0)),
            mode="edge",
        )
        pooled = nn.avg_pool(patches, (pw, pw), (pw, pw), padding="VALID")
        P2 = pooled.shape[1] * pooled.shape[2]
        pooled = pooled.reshape(B, len(non), P2, C)
        non_tok = jnp.concatenate([spec, pooled], axis=2).reshape(
            B, len(non) * (psi + P2), C)
        return jnp.concatenate([anchor_tok, non_tok], axis=1)

    @nn.compact
    def __call__(self, carry, layer_idx):
        # RoPE caches ride the carry as raw cos/sin arrays (scan carries
        # must be arrays); nsplit=2 is static
        merging = self.merge_pool > 1 and self.S > self.merge_stride
        if merging:
            x, taps, cos_f, sin_f, cos_g, sin_g, cos_kv, sin_kv = carry
        else:
            x, taps, cos_f, sin_f, cos_g, sin_g = carry
        pos_frame = (cos_f, sin_f, StaticDim(2))
        pos_global = (cos_g, sin_g, StaticDim(2))
        B, S = self.B, self.S
        T = x.shape[1]
        block_cls = nn.remat(Block) if self.remat else Block
        frame_blk = block_cls(
            dim=self.dim, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qk_norm=self.qk_norm, init_values=self.init_values, rope="2d",
            rope_base=self.rope_base, dtype=self.dtype, quant=True,
            fused_tail=True, name="frame_block",
        )
        global_blk = block_cls(
            dim=self.dim, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qk_norm=self.qk_norm, init_values=self.init_values, rope="2d",
            rope_base=self.rope_base, dtype=self.dtype, quant=True,
            seq_axis=self.seq_axis, fused_tail=True, name="global_block",
        )
        x = frame_blk(x, pos_frame)                       # (B*S, T, C)
        frame_out = x
        xg = x.reshape(B, S * T, self.dim)
        if merging:
            xg = global_blk(xg, pos_global, kv=self._merged_kv(x),
                            pos_kv=(cos_kv, sin_kv, StaticDim(2)))  # (B, S*T, C)
        else:
            xg = global_blk(xg, pos_global)               # (B, S*T, C)
        x = xg.reshape(B * S, T, self.dim)

        concat = jnp.concatenate([frame_out, x], axis=-1).reshape(
            B, S, T, 2 * self.dim
        )
        # one dynamic-update-slice into a slot LUT (non-tap layers write the
        # trailing garbage slot) — a per-tap where-chain would read+rewrite
        # every tap slot on every layer, ~6x the HBM traffic of this write
        unique_taps = sorted(set(self.tap_layers))
        slot_lut = jnp.asarray(
            [unique_taps.index(i) if i in unique_taps else len(unique_taps)
             for i in range(self.depth)], jnp.int32,
        )
        taps = jax.lax.dynamic_update_slice_in_dim(
            taps, concat[None], slot_lut[layer_idx], axis=0
        )
        if merging:
            return (x, taps, cos_f, sin_f, cos_g, sin_g, cos_kv, sin_kv), None
        return (x, taps, cos_f, sin_f, cos_g, sin_g), None


class Aggregator(nn.Module):
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    rope_base: float = 100.0
    patch_embed_depth: int = 24
    patch_embed_heads: int = 16
    qk_norm: bool = True
    init_values: float = 0.01
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    intermediate_layers: Sequence[int] = (4, 11, 17, 23)
    # sequence parallelism: the frame axis S is sharded over this named
    # mesh axis (callers wrap apply in shard_map); frame attention, patch
    # embedding and MLPs are frame-local, the global blocks all-gather K/V
    seq_axis: str | None = None
    # KV-compressed global attention (opt-in approximation for the 75-frame
    # large-chunk variants): 0/1 = exact; pool p > 1 average-pools the
    # non-anchor frames' patch K/V p x p, anchors (every merge_stride-th
    # frame) stay full. Queries are never reduced.
    merge_pool: int = 0
    merge_stride: int = 1

    @property
    def patch_start_idx(self) -> int:
        return 1 + self.num_register_tokens

    @nn.compact
    def __call__(self, images: jax.Array, patch_tokens=None,
                 embed_only: bool = False):
        """images (B, S, 3, H, W) in [0, 1].

        Default: full forward. With ``embed_only`` (static), stops after the
        per-frame patch embedding and returns (B, S, P, embed_dim) — the
        pipeline uses this to embed each unique frame ONCE per chunk group
        (consecutive chunks share their overlap frames). With
        ``patch_tokens`` (B, S, P, embed_dim) provided, the embedding is
        skipped and the given tokens are used (the matching second half).

        Returns:
            tapped: list of (B, S, P_total, 2*embed_dim) outputs, one per
                entry of ``intermediate_layers`` (duplicates allowed), each
                the concat of that layer-pair's frame/global outputs.
            patch_start_idx: index of the first patch token.
        """
        B, S, C, H, W = images.shape
        if patch_tokens is None:
            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32).reshape(1, 1, 3, 1, 1)
            std = jnp.asarray(IMAGENET_STD, jnp.float32).reshape(1, 1, 3, 1, 1)
            images_n = (images.astype(jnp.float32) - mean) / std

            patch_tokens = PatchEmbedViT(
                img_size=self.img_size, patch_size=self.patch_size,
                embed_dim=self.embed_dim, depth=self.patch_embed_depth,
                num_heads=self.patch_embed_heads, dtype=self.dtype,
                remat=self.remat, name="patch_embed",
            )(images_n.reshape(B * S, C, H, W))
            if embed_only:
                return patch_tokens.reshape(
                    B, S, patch_tokens.shape[1], self.embed_dim)
        else:
            patch_tokens = patch_tokens.reshape(
                B * S, patch_tokens.shape[2], self.embed_dim).astype(self.dtype)
        gh, gw = H // self.patch_size, W // self.patch_size

        camera_token = self.param(
            "camera_token", nn.initializers.normal(stddev=1e-6),
            (2, 1, self.embed_dim), jnp.float32,
        )
        register_token = self.param(
            "register_token", nn.initializers.normal(stddev=1e-6),
            (2, self.num_register_tokens, self.embed_dim), jnp.float32,
        )
        frame_offset = (jax.lax.axis_index(self.seq_axis) * S
                        if self.seq_axis else 0)
        cam = expand_frame_tokens(camera_token, B, S, frame_offset).astype(self.dtype)
        reg = expand_frame_tokens(register_token, B, S, frame_offset).astype(self.dtype)
        x = jnp.concatenate([cam, reg, patch_tokens], axis=1)  # (B*S, T, C)
        T = x.shape[1]

        pos_frame = patch_grid_positions(B * S, gh, gw, self.patch_start_idx)
        pos_global = pos_frame.reshape(B, S * T, 2)
        # hoist RoPE trig out of the 24-layer scan: one cos/sin cache per
        # attention flavor instead of recomputing angles in every block —
        # pre-tiled across heads to the full lane width (and in compute
        # dtype), so the blocks' flat-layout RoPE does no per-layer tiling
        head_dim = self.embed_dim // self.num_heads
        from ..nn.rope import rope_cache_2d

        def tiled(c):
            return jnp.tile(c, (1, 1, self.num_heads)).astype(self.dtype)

        cos_f, sin_f, _ = rope_cache_2d(pos_frame, head_dim, self.rope_base)
        cos_g, sin_g, _ = rope_cache_2d(pos_global, head_dim, self.rope_base)
        cos_f, sin_f = tiled(cos_f), tiled(sin_f)
        cos_g, sin_g = tiled(cos_g), tiled(sin_g)

        merging = (self.merge_pool > 1 and self.seq_axis is None
                   and S > self.merge_stride)
        if merging:
            # RoPE cache for the merged KV set: anchor frames reuse the
            # full per-frame grid positions; pooled tokens sit at the MEAN
            # position of their pooling window (same edge-replicated
            # pooling as the tokens, so position matches content)
            pw = self.merge_pool
            anchors = tuple(range(0, S, self.merge_stride))
            n_non = S - len(anchors)
            rows = jnp.broadcast_to(
                jnp.arange(1, gh + 1, dtype=jnp.float32)[:, None], (gh, gw))
            cols = jnp.broadcast_to(
                jnp.arange(1, gw + 1, dtype=jnp.float32)[None, :], (gh, gw))
            grid = jnp.stack([rows, cols], axis=-1)[None]  # (1, gh, gw, 2)
            grid = jnp.pad(
                grid, ((0, 0), (0, (-gh) % pw), (0, (-gw) % pw), (0, 0)),
                mode="edge")
            pooled_pos = nn.avg_pool(grid, (pw, pw), (pw, pw),
                                     padding="VALID")
            pooled_pos = pooled_pos.reshape(1, -1, 2)
            frame_pos = patch_grid_positions(
                1, gh, gw, self.patch_start_idx).astype(jnp.float32)
            kv_pos_non = jnp.concatenate(
                [jnp.zeros((1, self.patch_start_idx, 2), jnp.float32),
                 pooled_pos], axis=1)
            cos_a, sin_a, _ = rope_cache_2d(frame_pos, head_dim,
                                            self.rope_base)
            cos_p, sin_p, _ = rope_cache_2d(kv_pos_non, head_dim,
                                            self.rope_base)
            cos_kv = jnp.concatenate(
                [jnp.tile(cos_a, (1, len(anchors), 1)),
                 jnp.tile(cos_p, (1, n_non, 1))], axis=1)
            sin_kv = jnp.concatenate(
                [jnp.tile(sin_a, (1, len(anchors), 1)),
                 jnp.tile(sin_p, (1, n_non, 1))], axis=1)
            cos_kv, sin_kv = tiled(cos_kv), tiled(sin_kv)

        unique_taps = sorted(set(self.intermediate_layers))
        # +1 garbage slot: non-tap layers' concat lands there (slot LUT)
        taps0 = jnp.zeros((len(unique_taps) + 1, B, S, T, 2 * self.embed_dim),
                          self.dtype)
        # unroll=depth turns the scan's dynamic weight slices into static
        # ones (profiling showed the stacked-weight dynamic-slice halves the
        # fc2 matmul rate); params stay stacked, so checkpoints/converters
        # are unaffected. Env-tunable while the compile-time cost is probed.
        unroll = int(os.environ.get("VITSLAM_AGG_UNROLL", "1"))
        scan = nn.scan(
            _AggPairScan,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.depth,
            unroll=self.depth if unroll >= self.depth else unroll,
        )(self.embed_dim, self.num_heads, self.mlp_ratio, self.qk_norm,
          self.init_values, self.rope_base, self.dtype, self.remat,
          tuple(self.intermediate_layers), self.depth, B, S,
          self.seq_axis, self.merge_pool if merging else 0,
          self.merge_stride, gh, gw, self.patch_start_idx, name="layers")
        carry0 = (x, taps0, cos_f, sin_f, cos_g, sin_g)
        if merging:
            carry0 = carry0 + (cos_kv, sin_kv)
        out_carry, _ = scan(carry0, jnp.arange(self.depth))
        x, taps = out_carry[0], out_carry[1]
        tap_of = {tl: taps[k] for k, tl in enumerate(unique_taps)}
        return [tap_of[tl] for tl in self.intermediate_layers], self.patch_start_idx

"""AlignmentHead — the trained feature-level chunk aligner (the thesis
contribution of the reference; behavior parity with
aligned_vggt/heads/alignment_head.py:19-567).

Given backbone tokens of the current chunk plus *overlap tokens* propagated
from the previous chunk (and optionally a rolling set of unit-norm *memory
tokens* summarizing all past chunks), it regresses

  * a chunk-level Sim(3) encoding (B, 1, 8) = [t(3), quat_xyzw(4), scale]
    (scale passed through exp), and
  * per-frame SE(3) corrections (B, S-1, 7) = [t(3), quat_xyzw(4)]
    for every frame but the first,

and emits the next chunk's overlap tokens + updated memory tokens.

Pipeline (reference :224-345):
  project_in (2048->1024) + LayerNorm; prepend a learned per-frame alignment
  token (first-frame / other-frame variants); ``depth_aa`` alternating
  [frame, temporal] rounds — frame attention = self-attn within each frame
  over P tokens with 2-D RoPE; temporal attention = cross-attention over
  time at a fixed spatial location: queries (B*P, S, C) attend to the
  previous chunk's overlap tokens (B*P, T, C) with 1-D RoPE where current
  positions are shifted by S-(T-1) so overlapping frames share ids
  (self-attention fallback for the first chunk). The alternative
  ``temporal_attention=False`` mode runs VGGT-style global attention over
  the concatenated (T+S)*P tokens.

Decoder (reference :427-540, fp32): token 0 of each frame -> project_dec
  (1024->512); the first-frame token cross-attends ``depth_decoder`` blocks
  to [frame tokens ‖ effective memory] (1-D RoPE ids 0..S-1 and 2S.. for
  memory); GatedUpdate writes the chunk summary into memory; frame tokens
  (excl. first) cross-attend to the chunk token with train-time non-overlap
  dropout rescaled by 1/(1-p); small MLPs decode the Sim(3)/SE(3) encodings.

TPU-first notes: all attention rides ops.scaled_dot_product_attention
(Pallas flash kernel for long KV); gradient checkpointing is handled by the
caller's remat policy rather than per-block torch.utils.checkpoint; the
decode path is fp32 (the reference wraps it in autocast(enabled=False)).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.gated_update import GatedUpdate
from ..nn.layers import Block, CrossAttentionBlock, Mlp
from ..nn.rope import patch_grid_positions
from .aggregator import expand_frame_tokens


def _orthogonal_rows(key, shape, dtype=jnp.float32):
    """(M, D) orthogonal rows normalized to unit norm (avoids early memory
    collapse — reference :211-214)."""
    m = nn.initializers.orthogonal()(key, shape, dtype)
    return m / jnp.linalg.norm(m, axis=-1, keepdims=True).clip(1e-8)


class AlignmentHead(nn.Module):
    patch_size: int = 14
    in_dim: int = 2048
    embed_dim: int = 1024
    dec_dim: int = 512
    depth_aa: int = 4
    depth_decoder: int = 2
    num_heads: int = 8
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    qk_norm: bool = True
    rope_base: float = 100.0
    init_values: float = 0.01
    num_memory_tokens: int = 8
    temporal_attention: bool = True
    drop_prob_nonoverlap: float = 0.2
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def patch_start_idx(self) -> int:
        # alignment token + camera token + register tokens
        return 1 + 1 + self.num_register_tokens

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,
        image_size: Tuple[int, int],
        next_num_overlap: int,
        overlap_tokens: Optional[jax.Array] = None,
        memory_tokens: Optional[jax.Array] = None,
        train: bool = False,
    ):
        """
        Args:
            tokens: (B, S, P0, in_dim) backbone tokens (camera+register+patch).
            image_size: (H, W) of the input images.
            next_num_overlap: overlap frames to hand to the next chunk.
            overlap_tokens: (B, T, 1+P0, embed_dim) processed tokens from the
                previous chunk (first-frame column + T-1 overlap frames), or
                None on the first chunk. Gradient-detached on receipt
                (reference :260).
            memory_tokens: (B, M, dec_dim) unit-norm rolling memory, or None.
            train: enables non-overlap frame dropout (needs 'dropout' rng).
        Returns:
            chunk_sim3_enc (B, 1, 8) fp32 (scale slot exp-mapped),
            frame_se3_encs (B, S-1, 7) fp32,
            memory_tokens (B, M, dec_dim) or None,
            new_overlap_tokens (B, 1+next_num_overlap, 1+P0, embed_dim).
        """
        H, W = image_size
        B, S, P0, _ = tokens.shape
        gh, gw = H // self.patch_size, W // self.patch_size

        x = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="project_in")(tokens.astype(self.dtype))
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="token_norm")(x)

        first_chunk = overlap_tokens is None
        if not first_chunk:
            overlap_tokens = jax.lax.stop_gradient(overlap_tokens).astype(self.dtype)
            T = overlap_tokens.shape[1]
        else:
            T = None

        align_tok = self.param(
            "per_frame_alignment_token", nn.initializers.normal(stddev=1e-6),
            (2, 1, self.embed_dim), jnp.float32,
        )
        at = expand_frame_tokens(align_tok, B, S).reshape(B, S, 1, self.embed_dim)
        x = jnp.concatenate([at.astype(self.dtype), x], axis=2)
        P = x.shape[2]  # 1 + P0

        # --- position ids -------------------------------------------------
        pos2d = patch_grid_positions(B * S, gh, gw, self.patch_start_idx)
        seq_ids = jnp.arange(S)
        if self.temporal_attention:
            if not first_chunk:
                att_ids = seq_ids + (S - (T - 1))
                cross_ids = jnp.concatenate([seq_ids[:1], seq_ids[-(T - 1):]])
            else:
                att_ids = seq_ids
                cross_ids = seq_ids
            pos_q_t = jnp.broadcast_to(att_ids[None], (B * P, S))
            pos_k_t = jnp.broadcast_to(cross_ids[None], (B * P, cross_ids.shape[0]))
        else:
            n_frames = S if first_chunk else S + T
            pos_global = patch_grid_positions(
                B * n_frames, gh, gw, self.patch_start_idx
            ).reshape(B, n_frames * P, 2)

        # --- alternating attention ----------------------------------------
        block_cls = nn.remat(Block) if train else Block
        xblock_cls = nn.remat(CrossAttentionBlock) if train else CrossAttentionBlock
        for i in range(self.depth_aa):
            # frame attention: self-attn within each frame
            xf = x.reshape(B * S, P, self.embed_dim)
            xf = block_cls(
                dim=self.embed_dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, qk_norm=self.qk_norm,
                init_values=self.init_values, rope="2d",
                rope_base=self.rope_base, dtype=self.dtype,
                name=f"frame_block_{i}",
            )(xf, pos2d)
            x = xf.reshape(B, S, P, self.embed_dim)

            if self.temporal_attention:
                # temporal cross-attention over time at fixed spatial location
                xt = jnp.swapaxes(x, 1, 2).reshape(B * P, S, self.embed_dim)
                if first_chunk:
                    cross = xt
                else:
                    cross = jnp.swapaxes(overlap_tokens, 1, 2).reshape(
                        B * P, T, self.embed_dim
                    )
                xt = xblock_cls(
                    dim=self.embed_dim, num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio, qk_norm=self.qk_norm,
                    init_values=self.init_values, rope="1d",
                    rope_base=self.rope_base, dtype=self.dtype,
                    name=f"temporal_block_{i}",
                )(xt, cross, (pos_q_t, pos_k_t))
                x = jnp.swapaxes(
                    xt.reshape(B, P, S, self.embed_dim), 1, 2
                )
            else:
                # VGGT-style global attention over (T+S)·P tokens
                if first_chunk:
                    xg = x.reshape(B, S * P, self.embed_dim)
                else:
                    xg = jnp.concatenate([overlap_tokens, x], axis=1).reshape(
                        B, (S + T) * P, self.embed_dim
                    )
                xg = block_cls(
                    dim=self.embed_dim, num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio, qk_norm=self.qk_norm,
                    init_values=self.init_values, rope="2d",
                    rope_base=self.rope_base, dtype=self.dtype,
                    name=f"global_block_{i}",
                )(xg, pos_global)
                n_frames = S if first_chunk else S + T
                xg = xg.reshape(B, n_frames, P, self.embed_dim)
                x = xg[:, -S:]

        per_frame_alignment_tokens = x[:, :, 0, :].astype(jnp.float32)

        chunk_sim3_enc, frame_se3_encs, memory_tokens = self._decode(
            per_frame_alignment_tokens, next_num_overlap, first_chunk,
            memory_tokens, train,
        )

        new_overlap = jnp.concatenate(
            [x[:, :1], x[:, S - next_num_overlap:]], axis=1
        )
        return chunk_sim3_enc, frame_se3_encs, memory_tokens, new_overlap

    def _decode(self, frame_tokens_in, num_overlap, is_first_chunk,
                memory_tokens, train):
        """fp32 decode of alignment encodings (reference :427-540)."""
        B, S, _ = frame_tokens_in.shape
        M = self.num_memory_tokens

        tokens = nn.Dense(self.dec_dim, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="project_dec")(frame_tokens_in)
        tokens = nn.LayerNorm(dtype=jnp.float32, name="dec_norm")(tokens)

        # 1-D RoPE ids: chunk token at 0 attends to frames 0..S-1 and memory
        # at 2S.. (unique ids outside the frame range).
        if M > 0:
            cross_ids = jnp.concatenate(
                [jnp.arange(S), jnp.arange(S, S + M) + S]
            )
        else:
            cross_ids = jnp.arange(S)
        pos_chunk = (
            jnp.zeros((B, 1), jnp.int32),
            jnp.broadcast_to(cross_ids[None], (B, cross_ids.shape[0])),
        )
        pos_frames = (
            jnp.broadcast_to(jnp.arange(1, S)[None], (B, S - 1)),
            jnp.zeros((B, 1), jnp.int32),
        )

        directional_memory = None
        if M > 0:
            mem_param = self.param(
                "memory_token", _orthogonal_rows, (M, self.dec_dim)
            )
            token_scale = jnp.linalg.norm(tokens, axis=-1).mean(
                axis=-1, keepdims=True
            )[:, None]  # (B, 1, 1)
            if memory_tokens is None:
                base_mem = jnp.broadcast_to(mem_param[None], (B, M, self.dec_dim))
                frame_init = nn.Dense(
                    M * self.dec_dim, dtype=jnp.float32, name="frame_proj"
                )(tokens[:, 0]).reshape(B, M, self.dec_dim)
                frame_dir = frame_init / jnp.linalg.norm(
                    frame_init, axis=-1, keepdims=True
                ).clip(1e-6)
                alpha = jax.nn.sigmoid(
                    self.param("alpha", nn.initializers.constant(0.1), ())
                )
                directional_memory = (1 - alpha) * base_mem + alpha * frame_dir
                effective_memory = base_mem * token_scale
            else:
                directional_memory = memory_tokens.astype(jnp.float32)
                effective_memory = directional_memory * token_scale
            cross_tokens = jnp.concatenate([tokens, effective_memory], axis=1)
        else:
            cross_tokens = tokens

        # chunk-level aggregation: first-frame token attends to all
        chunk_tok = tokens[:, :1]
        for i in range(self.depth_decoder):
            chunk_tok = CrossAttentionBlock(
                dim=self.dec_dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, qk_norm=self.qk_norm,
                init_values=self.init_values, rope="1d",
                rope_base=self.rope_base, dtype=jnp.float32,
                name=f"chunk_cross_block_{i}",
            )(chunk_tok, cross_tokens, pos_chunk)

        new_memory = None
        if M > 0:
            new_memory = GatedUpdate(
                self.dec_dim, M, name="gated_update"
            )(directional_memory, chunk_tok[:, 0])
        chunk_tok = nn.LayerNorm(dtype=jnp.float32, name="chunk_norm")(chunk_tok)

        frame_toks = tokens[:, 1:]
        if (
            train and self.drop_prob_nonoverlap > 0.0 and not is_first_chunk
            and (S - 1 - num_overlap) > 1
        ):
            key = self.make_rng("dropout")
            keep = (
                jax.random.uniform(key, (B, S - 1 - num_overlap))
                > self.drop_prob_nonoverlap
            ).astype(jnp.float32)[..., None]
            mask = jnp.concatenate(
                [keep, jnp.ones((B, num_overlap, 1), jnp.float32)], axis=1
            )
            frame_toks = frame_toks * mask / (1.0 - self.drop_prob_nonoverlap)

        for i in range(self.depth_decoder):
            frame_toks = CrossAttentionBlock(
                dim=self.dec_dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, qk_norm=self.qk_norm,
                init_values=self.init_values, rope="1d",
                rope_base=self.rope_base, dtype=jnp.float32,
                name=f"frame_cross_block_{i}",
            )(frame_toks, chunk_tok, pos_frames)
        frame_toks = nn.LayerNorm(dtype=jnp.float32, name="frame_norm")(frame_toks)

        frame_se3_encs = Mlp(self.dec_dim // 2, 7, dtype=jnp.float32,
                             name="frame_se3_decoder")(frame_toks)
        chunk_sim3 = Mlp(self.dec_dim // 2, 8, dtype=jnp.float32,
                         name="chunk_sim3_decoder")(chunk_tok)
        chunk_sim3 = jnp.concatenate(
            [chunk_sim3[..., :-1],
             jnp.exp(jnp.clip(chunk_sim3[..., -1:], -20.0, 20.0))], axis=-1
        )
        return chunk_sim3, frame_se3_encs, new_memory

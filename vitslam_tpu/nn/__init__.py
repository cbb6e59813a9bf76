from .rope import apply_rope_1d, apply_rope_2d, patch_grid_positions
from .layers import (
    Attention,
    Block,
    CrossAttention,
    CrossAttentionBlock,
    DecoderBlock,
    LayerScale,
    Mlp,
)
from .gated_update import GatedUpdate

__all__ = [
    "apply_rope_1d", "apply_rope_2d", "patch_grid_positions",
    "Attention", "Block", "CrossAttention", "CrossAttentionBlock",
    "DecoderBlock", "LayerScale", "Mlp", "GatedUpdate",
]

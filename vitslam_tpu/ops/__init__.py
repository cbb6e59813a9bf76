from .attention import scaled_dot_product_attention
from .flash_attention import flash_attention

__all__ = ["scaled_dot_product_attention", "flash_attention"]

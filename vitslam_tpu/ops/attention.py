"""Attention dispatch: Pallas flash kernel on TPU, XLA elsewhere.

The models never use attention masks (the reference's all-ones-mask SDPA
call at aligned_vggt/layers/cross_attention.py:64-67 is a torch crash
workaround with no masking semantics), so the fused path is maskless.
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention

# Flash kernel pays off once the KV sequence is long enough to stream;
# below this we let XLA fuse the small attention directly.
_FLASH_MIN_KV = 512


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover - backend probing
        return False


def scaled_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    impl: str = "auto",
    static_max: float | None = None,
) -> jax.Array:
    """Attention over (B, H, Nq, D) queries and (B, H, Nk, D) keys/values.

    impl: 'auto' (flash on TPU for long KV), 'flash', or 'xla'.
    Override globally with VITSLAM_ATTN_IMPL=xla|flash for debugging.
    """
    impl = os.environ.get("VITSLAM_ATTN_IMPL", impl)
    nk = k.shape[2]
    use_flash = impl == "flash" or (
        impl == "auto" and _on_tpu() and nk >= _FLASH_MIN_KV
    )
    if use_flash:
        return flash_attention(q, k, v, static_max=static_max)
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

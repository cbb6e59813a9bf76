"""Fused qkv-packed attention kernel (ops/fused_attention.py): numerics vs
the plain-XLA reference math and vs the unfused Attention module path, on
CPU via the pallas TPU interpreter."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from vitslam_tpu.ops.fused_attention import (
    _fused_reference,
    fused_qkv_attention,
)

pytestmark = pytest.mark.quick


def _mk(nq, h, dh, seed=0, with_ln=True, with_rope=True):
    rng = np.random.default_rng(seed)
    C = h * dh
    qkv = jnp.asarray(rng.normal(size=(2, nq, 3 * C)), jnp.float32)
    cos = sin = None
    q_ln = k_ln = None
    if with_rope:
        ang = rng.uniform(0, 2 * np.pi, size=(2, nq, dh))
        cos = jnp.asarray(np.cos(ang), jnp.float32)
        sin = jnp.asarray(np.sin(ang), jnp.float32)
    if with_ln:
        q_ln = (jnp.asarray(rng.normal(1, 0.1, dh), jnp.float32),
                jnp.asarray(rng.normal(0, 0.1, dh), jnp.float32))
        k_ln = (jnp.asarray(rng.normal(1, 0.1, dh), jnp.float32),
                jnp.asarray(rng.normal(0, 0.1, dh), jnp.float32))
    return qkv, cos, sin, q_ln, k_ln


@pytest.mark.parametrize("nq,with_ln,with_rope,smax", [
    (130, True, True, 8.0),     # ragged, bounded qk-norm path
    (256, True, True, 8.0),     # exact block fit
    (130, False, False, None),  # embed-style: no LN/rope, online max
    (640, True, True, 8.0),     # multiple q blocks over one K tile
])
def test_fused_matches_reference(nq, with_ln, with_rope, smax):
    h, dh = 2, 32
    qkv, cos, sin, q_ln, k_ln = _mk(nq, h, dh, with_ln=with_ln,
                                    with_rope=with_rope)
    with pltpu.force_tpu_interpret_mode():
        got = fused_qkv_attention(qkv, num_heads=h, cos=cos, sin=sin,
                                  q_ln=q_ln, k_ln=k_ln, static_max=smax)
    zero = jnp.zeros((dh,), jnp.float32)
    want = _fused_reference(
        qkv, cos if cos is not None else jnp.zeros((2, nq, dh)),
        sin if sin is not None else jnp.zeros((2, nq, dh)),
        *(q_ln if q_ln else (zero, zero)), *(k_ln if k_ln else (zero, zero)),
        num_heads=h, scale=1.0 / np.sqrt(dh), nsplit=2,
        do_ln=with_ln, do_rope=with_rope)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_fused_gradient_runs_and_matches_reference():
    h, dh = 2, 32
    qkv, cos, sin, q_ln, k_ln = _mk(130, h, dh)

    def loss_fused(qkv):
        with pltpu.force_tpu_interpret_mode():
            o = fused_qkv_attention(qkv, num_heads=h, cos=cos, sin=sin,
                                    q_ln=q_ln, k_ln=k_ln, static_max=8.0)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_ref(qkv):
        o = _fused_reference(qkv, cos, sin, *q_ln, *k_ln, num_heads=h,
                             scale=1.0 / np.sqrt(dh), nsplit=2,
                             do_ln=True, do_rope=True)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    g1 = jax.grad(loss_fused)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-2,
                               rtol=5e-2)


def test_attention_module_fused_matches_flat():
    """Attention with the fused kernel == the unfused flat path."""
    from vitslam_tpu.nn.layers import Attention
    from vitslam_tpu.nn.rope import patch_grid_positions, rope_cache_2d

    h, dh = 4, 32
    C = h * dh
    attn = Attention(dim=C, num_heads=h, qk_norm=True, rope="2d",
                     dtype=jnp.float32)
    pos_arr = patch_grid_positions(2, 23, 23, 4)  # N = 533 > fused cutoff
    cos, sin, nsplit = rope_cache_2d(pos_arr, dh, 100.0)
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, pos_arr.shape[1], C)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x, (cos, sin, nsplit))

    os.environ["VITSLAM_FUSED_ATTN"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            got = attn.apply(params, x, (cos, sin, nsplit))
    finally:
        os.environ["VITSLAM_FUSED_ATTN"] = "0"
    try:
        want = attn.apply(params, x, (cos, sin, nsplit))
    finally:
        del os.environ["VITSLAM_FUSED_ATTN"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2,
                               rtol=2e-2)

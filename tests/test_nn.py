"""Tests for nn building blocks: RoPE invariants, attention parity
(flash-in-interpret vs XLA), block shapes, GatedUpdate invariants."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitslam_tpu.nn import (
    Attention, Block, CrossAttention, CrossAttentionBlock, GatedUpdate,
    LayerScale, Mlp, apply_rope_1d, apply_rope_2d, patch_grid_positions,
)
from vitslam_tpu.ops.attention import scaled_dot_product_attention
from vitslam_tpu.ops import flash_attention

pytestmark = pytest.mark.quick


class TestRope:
    def test_rope_preserves_norm(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 4, 10, 32)), jnp.float32)
        pos = jnp.asarray(rng.integers(0, 50, size=(2, 10)))
        out = apply_rope_1d(x, pos)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-5,
        )

    def test_rope_relative_property(self):
        # <rope(q, i), rope(k, j)> depends only on i - j.
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 1, 1, 16)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 1, 1, 16)), jnp.float32)

        def dot_at(i, j):
            qi = apply_rope_1d(q, jnp.asarray([[i]]))
            kj = apply_rope_1d(k, jnp.asarray([[j]]))
            return float(jnp.sum(qi * kj))

        assert abs(dot_at(3, 1) - dot_at(10, 8)) < 1e-4
        assert abs(dot_at(0, 0) - dot_at(7, 7)) < 1e-4

    def test_rope_zero_pos_identity(self):
        x = jnp.ones((1, 2, 3, 8), jnp.float32)
        out = apply_rope_1d(x, jnp.zeros((1, 3), jnp.int32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_rope_2d_axes_independent(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 2, 4, 16)), jnp.float32)
        pos_a = jnp.asarray([[[1, 5], [2, 5], [3, 5], [4, 5]]])
        pos_b = jnp.asarray([[[1, 9], [2, 9], [3, 9], [4, 9]]])
        a = np.asarray(apply_rope_2d(x, pos_a))
        b = np.asarray(apply_rope_2d(x, pos_b))
        # first half (row-rotated) identical, second half differs
        np.testing.assert_allclose(a[..., :8], b[..., :8], atol=1e-6)
        assert np.abs(a[..., 8:] - b[..., 8:]).max() > 1e-3

    def test_patch_grid_positions(self):
        pos = np.asarray(patch_grid_positions(2, 3, 4, num_special=5))
        assert pos.shape == (2, 5 + 12, 2)
        assert (pos[:, :5] == 0).all()
        assert pos[0, 5].tolist() == [1, 1]
        assert pos[0, -1].tolist() == [3, 4]


class TestAttention:
    def test_flash_matches_xla_interpret(self):
        # Run the Pallas kernel in interpreter mode on CPU and compare to XLA.
        from vitslam_tpu.ops import flash_attention as fa_fn

        rng = np.random.default_rng(3)
        B, H, N, D = 1, 2, 300, 64
        q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, N + 37, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, N + 37, D)), jnp.float32)

        ref = scaled_dot_product_attention(q, k, v, impl="xla")
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out = fa_fn(q, k, v, block_q=128, block_k=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_xla_cross_attention_shapes(self):
        rng = np.random.default_rng(4)
        q = jnp.asarray(rng.normal(size=(3, 4, 7, 16)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 4, 13, 16)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(3, 4, 13, 16)), jnp.float32)
        out = scaled_dot_product_attention(q, k, v)
        assert out.shape == (3, 4, 7, 16)

    def test_attention_softmax_rows(self):
        # uniform keys -> output = mean of values
        q = jnp.zeros((1, 1, 5, 8), jnp.float32)
        k = jnp.zeros((1, 1, 9, 8), jnp.float32)
        v = jnp.asarray(np.random.default_rng(5).normal(size=(1, 1, 9, 8)), jnp.float32)
        out = scaled_dot_product_attention(q, k, v, impl="xla")
        np.testing.assert_allclose(
            np.asarray(out[0, 0, 0]), np.asarray(v[0, 0].mean(axis=0)), atol=1e-5
        )


class TestModules:
    def test_block_forward(self):
        m = Block(dim=64, num_heads=4, init_values=0.01, rope="2d", dtype=jnp.float32)
        x = jnp.ones((2, 10, 64))
        pos = patch_grid_positions(2, 2, 4, num_special=2)
        params = m.init(jax.random.PRNGKey(0), x, pos)
        y = m.apply(params, x, pos)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

    def test_cross_attention_block(self):
        m = CrossAttentionBlock(dim=32, num_heads=4, qk_norm=True, rope="1d")
        x = jnp.ones((2, 5, 32))
        y = jnp.ones((2, 8, 32))
        pos = (jnp.tile(jnp.arange(5)[None], (2, 1)), jnp.tile(jnp.arange(8)[None], (2, 1)))
        params = m.init(jax.random.PRNGKey(0), x, y, pos)
        out = m.apply(params, x, y, pos)
        assert out.shape == x.shape

    def test_layerscale_init(self):
        m = LayerScale(8, init_values=0.01)
        x = jnp.ones((1, 8))
        params = m.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(m.apply(params, x)), 0.01, rtol=1e-6)

    def test_gated_update_unit_norm_output(self):
        m = GatedUpdate(token_dim=16, num_tokens=4)
        rng = np.random.default_rng(6)
        mem = rng.normal(size=(2, 4, 16)).astype(np.float32)
        mem /= np.linalg.norm(mem, axis=-1, keepdims=True)
        upd = rng.normal(size=(2, 16)).astype(np.float32)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(mem), jnp.asarray(upd))
        out = np.asarray(m.apply(params, jnp.asarray(mem), jnp.asarray(upd)))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
        # memory actually moves
        assert np.abs(out - mem).max() > 1e-4

    def test_gated_update_gate_detached(self):
        # Gradient flows to delta MLPs but gate input is detached:
        # gate params still get gradient through the gate value itself.
        m = GatedUpdate(token_dim=8, num_tokens=2)
        mem = jnp.ones((1, 2, 8)) / jnp.sqrt(8.0)
        upd = jnp.ones((1, 8))
        params = m.init(jax.random.PRNGKey(0), mem, upd)

        def loss(p):
            return jnp.sum(m.apply(p, mem, upd) ** 2)

        g = jax.grad(loss)(params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(t)).all() for t in flat)


class TestRopeCache:
    def test_cached_2d_matches_direct(self):
        from vitslam_tpu.nn.rope import apply_rope_cached, rope_cache_2d
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(2, 4, 10, 16)), jnp.float32)
        pos = jnp.asarray(rng.integers(0, 30, size=(2, 10, 2)))
        direct = apply_rope_2d(x, pos)
        cached = apply_rope_cached(x, rope_cache_2d(pos, 16))
        np.testing.assert_allclose(np.asarray(cached), np.asarray(direct), atol=1e-6)

    def test_cached_1d_matches_direct(self):
        from vitslam_tpu.nn.rope import apply_rope_cached, rope_cache_1d
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(1, 2, 7, 8)), jnp.float32)
        pos = jnp.asarray(rng.integers(0, 20, size=(1, 7)))
        direct = apply_rope_1d(x, pos)
        cached = apply_rope_cached(x, rope_cache_1d(pos, 8))
        np.testing.assert_allclose(np.asarray(cached), np.asarray(direct), atol=1e-6)

def test_flash_static_max_matches_xla():
    # bounded-logit fast path must match the online-softmax result
    from vitslam_tpu.ops import flash_attention as fa_fn
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(1, 2, 200, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 233, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 233, 64)), jnp.float32)
    ref = scaled_dot_product_attention(q, k, v, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = fa_fn(q, k, v, block_q=128, block_k=128, static_max=24.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_traced_static_max_matches_xla():
    # the shift may be a traced scalar (derived from learned qk-norm gains
    # at call time); logits here exceed the old hard-coded 24 by design
    from vitslam_tpu.ops import flash_attention as fa_fn
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(10)
    q = 2.5 * jnp.asarray(rng.normal(size=(1, 1, 150, 64)), jnp.float32)
    k = 2.5 * jnp.asarray(rng.normal(size=(1, 1, 170, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 1, 170, 64)), jnp.float32)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(64)
    true_max = float(np.abs(logits).max())
    assert true_max > 24.0  # past the old fixed shift -> would have NaN'd
    shift = jnp.asarray(true_max + 1.0)  # traced scalar
    ref = scaled_dot_product_attention(q, k, v, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = jax.jit(
            lambda q, k, v, s: fa_fn(q, k, v, block_q=128, block_k=128,
                                     static_max=s)
        )(q, k, v, shift)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_qk_shift_guard_dominates_logits():
    # Drive the qk-norm gains far past the old bound: the derived shift must
    # upper-bound every achievable logit, so exp(s - shift) cannot overflow
    # (VERDICT.md Weak #4: guard fires instead of NaNs).
    from vitslam_tpu.nn.layers import qk_logit_bound

    rng = np.random.default_rng(11)
    dh = 64
    for gain in (1.0, 3.0, 10.0, 50.0):
        g_q = gain * rng.uniform(0.5, 1.5, size=dh).astype(np.float32)
        b_q = rng.normal(size=dh).astype(np.float32)
        g_k = gain * rng.uniform(0.5, 1.5, size=dh).astype(np.float32)
        b_k = rng.normal(size=dh).astype(np.float32)

        x = rng.normal(size=(512, dh)).astype(np.float32)
        y = rng.normal(size=(512, dh)).astype(np.float32)

        def ln(t, g, b):
            t = (t - t.mean(-1, keepdims=True)) / t.std(-1, keepdims=True)
            return t * g + b

        q = ln(x, g_q, b_q)
        k = ln(y, g_k, b_k)
        logits = q @ k.T / np.sqrt(dh)
        bound = float(qk_logit_bound(
            {"scale": jnp.asarray(g_q), "bias": jnp.asarray(b_q)},
            {"scale": jnp.asarray(g_k), "bias": jnp.asarray(b_k)}, dh,
        ))
        assert bound >= np.abs(logits).max(), (gain, bound, np.abs(logits).max())


def test_attention_module_large_gains_stay_finite():
    # End-to-end: an Attention module whose qk-norm gains drifted to 8x the
    # init must produce finite outputs through the flash kernel.
    from jax.experimental.pallas import tpu as pltpu

    m = Attention(dim=64, num_heads=1, qk_norm=True, dtype=jnp.float32)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(1, 600, 64)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map_with_path(
        lambda path, v: 8.0 * v if any(
            getattr(p, "key", None) in ("q_norm", "k_norm") for p in path
        ) and path[-1].key == "scale" else v,
        params,
    )
    import os
    os.environ["VITSLAM_ATTN_IMPL"] = "flash"
    try:
        with pltpu.force_tpu_interpret_mode():
            out = m.apply(params, x)
    finally:
        del os.environ["VITSLAM_ATTN_IMPL"]
    assert np.isfinite(np.asarray(out)).all()


class TestMatmulResize:
    """ops/resize.py — MXU-matmul bilinear vs jax.image.resize semantics."""

    def _check(self, h, w, oh, ow, tol=2e-5):
        from vitslam_tpu.ops.resize import resize_bilinear_nhwc

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(2, h, w, 3)), jnp.float32)
        got = resize_bilinear_nhwc(x, oh, ow)
        want = jax.image.resize(
            x, (2, oh, ow, 3), method="bilinear", antialias=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=tol)

    def test_upscale(self):
        self._check(37, 37, 74, 74)

    def test_upscale_noninteger(self):
        self._check(37, 29, 100, 80)

    def test_downscale_antialiased(self):
        self._check(64, 64, 24, 24)

    def test_mixed(self):
        self._check(40, 64, 80, 32)

    def test_identity(self):
        from vitslam_tpu.ops.resize import resize_bilinear_nhwc

        x = jnp.ones((1, 8, 8, 2))
        assert resize_bilinear_nhwc(x, 8, 8) is x

    def test_dpt_shapes(self):
        # the DPT head's actual resize sites at 518^2: patch grid 37 -> 74,
        # 148, 296 and the final full-res map. At 296->518 jax.image.resize's
        # fp32 sample positions drift ~1e-4 from our float64 weights — the
        # float64 weights are the more accurate ones, and the head computes
        # in bf16 (~1e-2) anyway.
        self._check(37, 37, 148, 148)
        self._check(296, 296, 518, 518, tol=5e-4)


def test_int8_backbone_close_to_bf16():
    """Opt-in int8 path (ops/quant.py): backbone outputs stay close to the
    full-precision path (dynamic symmetric quant, ~1e-2 relative)."""
    import os

    from vitslam_tpu.models.aggregator import Aggregator

    agg = Aggregator(img_size=28, patch_size=14, embed_dim=64, depth=2,
                     num_heads=2, patch_embed_depth=1,
                     intermediate_layers=(0, 1, 1, 1), dtype=jnp.float32)
    imgs = jnp.asarray(np.random.default_rng(0).uniform(
        size=(1, 2, 3, 28, 42)), jnp.float32)
    params = agg.init(jax.random.PRNGKey(0), imgs)
    ref, _ = agg.apply(params, imgs)
    os.environ["VITSLAM_INT8"] = "1"
    try:
        got, _ = agg.apply(params, imgs)
    finally:
        del os.environ["VITSLAM_INT8"]
    a = np.asarray(ref[-1], np.float64).ravel()
    b = np.asarray(got[-1], np.float64).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.995, cos
    assert np.isfinite(b).all()

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


@pytest.mark.parametrize("tns", ["1", "0"])
@pytest.mark.parametrize("nq,with_ln,with_rope,smax", [
    (130, True, True, 8.0),     # ragged, bounded: row mask + fixed shift
    (256, True, True, 8.0),     # exact block fit
    (130, False, False, None),  # online-max path: axis-0 max in tns layout
    (640, True, True, 8.0),     # multiple q blocks over one K tile
])
def test_fused_tns_matches_reference(nq, with_ln, with_rope, smax, tns,
                                     monkeypatch):
    """Both whole-K accumulators — tns (the round-5 default) and the std
    layout (VITSLAM_FUSED_TNS=0 opt-out) — are the same math on every
    shape class."""
    monkeypatch.setenv("VITSLAM_FUSED_TNS", tns)
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


class TestFlatFlashLargeN:
    """flat_flash_attention — the >4096-token streaming path the 75/30
    variants ride (VERDICT r2 Next #1 done-criterion: kernel-vs-XLA parity
    at a >4096-token shape) — vs plain softmax attention, incl. the
    ragged-tail pad-mass correction, cross-length K/V (the KV-merged mode
    feeds Nk != Nq), and the custom-VJP backward."""

    def _run(self, nq, nk, h=2, dh=64, seed=0):
        from vitslam_tpu.ops.fused_attention import flat_flash_attention

        rng = np.random.default_rng(seed)
        C = h * dh
        q = jnp.asarray(rng.normal(size=(1, nq, C)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, nk, C)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, nk, C)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = flat_flash_attention(q, k, v, num_heads=h, static_max=16.0)

        def expect(q, k, v):
            split = lambda t: t.reshape(1, t.shape[1], h, dh).swapaxes(1, 2)
            qh, kh, vh = split(q), split(k), split(v)
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(dh)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
            return o.swapaxes(1, 2).reshape(1, q.shape[1], C)

        return np.asarray(out, np.float32), np.asarray(expect(q, k, v))

    def test_large_n_matches_softmax(self):
        got, want = self._run(4352, 4352)
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)

    def test_ragged_tail_pad_mass(self):
        got, want = self._run(4250, 4250)  # not a block multiple
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)

    def test_cross_length_kv(self):
        got, want = self._run(640, 4352)  # Nk != Nq (KV-merged shape)
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)

    @pytest.mark.parametrize("tns", ["1", "0"])
    @pytest.mark.parametrize("nq,nk", [(4352, 4352), (4250, 4250),
                                       (640, 4352)])
    def test_transposed_kernel_matches_softmax(self, nq, nk, tns,
                                               monkeypatch):
        """Both streaming accumulators — tns (full-lane transposed values
        matmul, _flat_stream_tns_kernel, the round-5 default) and the std
        layout (VITSLAM_FLAT_TNS=0 opt-out) — are identical math on every
        shape class."""
        monkeypatch.setenv("VITSLAM_FLAT_TNS", tns)
        got, want = self._run(nq, nk)
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)

    def test_backward_runs_and_matches_reference_grad(self):
        """The custom VJP recomputes through _flat_reference — this would
        have caught the unbound-N regression in that path."""
        from vitslam_tpu.ops.fused_attention import flat_flash_attention

        rng = np.random.default_rng(3)
        h, dh = 2, 64
        C = h * dh
        nq = nk = 4352
        q = jnp.asarray(rng.normal(size=(1, nq, C)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, nk, C)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, nk, C)), jnp.float32)

        def f(q, k, v):
            return jnp.sum(flat_flash_attention(
                q, k, v, num_heads=h, static_max=16.0) ** 2)

        def f_ref(q, k, v):
            split = lambda t: t.reshape(1, t.shape[1], h, dh).swapaxes(1, 2)
            qh, kh, vh = split(q), split(k), split(v)
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(dh)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
            return jnp.sum(o.swapaxes(1, 2).reshape(1, nq, C) ** 2)

        with pltpu.force_tpu_interpret_mode():
            gq, gk, gv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        rq, rk, rv = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for g, r, name in ((gq, rq, "dq"), (gk, rk, "dk"), (gv, rv, "dv")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=5e-2, rtol=5e-2, err_msg=name)


class TestMlpTail:
    """ops/mlp_tail.py: fc2+bias+residual+LayerNorm fusion vs plain math."""

    @pytest.mark.parametrize("m,f,c", [(256, 512, 256), (300, 512, 128)])
    def test_matches_reference(self, m, f, c):
        from vitslam_tpu.ops.mlp_tail import mlp_tail, mlp_tail_reference

        rng = np.random.default_rng(0)
        h = jnp.asarray(rng.normal(size=(m, f)), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(f, c)) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
        res = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
        gamma = jnp.asarray(rng.normal(1, 0.1, size=(c,)), jnp.float32)
        beta = jnp.asarray(rng.normal(0, 0.1, size=(c,)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            x, y = mlp_tail(h, w2, b2, res, gamma, beta,
                            block_m=128, block_k=256)
        xr, yr = mlp_tail_reference(h, w2, b2, res, gamma, beta)
        np.testing.assert_allclose(np.asarray(x), np.asarray(xr),
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   atol=1e-3, rtol=1e-3)


class TestBlockFusedTail:
    """nn/layers.py Block fused_tail: the proj+LayerScale+residual+norm2
    and gelu+fc2+LayerScale+residual Pallas epilogues vs the unfused
    block math, via the TPU interpreter on CPU."""

    @pytest.mark.parametrize("init_values", [None, 0.01])
    def test_matches_unfused(self, monkeypatch, init_values):
        from vitslam_tpu.nn.layers import Block

        rng = np.random.default_rng(7)
        C, heads = 256, 4
        x = jnp.asarray(rng.normal(size=(2, 512, C)), jnp.float32)  # 1024 rows
        blk = Block(dim=C, num_heads=heads, qk_norm=False, rope=None,
                    init_values=init_values, dtype=jnp.float32,
                    fused_tail=True)
        monkeypatch.setenv("VITSLAM_MLP_TAIL", "0")
        params = blk.init(jax.random.PRNGKey(0), x)
        ref = blk.apply(params, x)
        monkeypatch.setenv("VITSLAM_MLP_TAIL", "1")
        with pltpu.force_tpu_interpret_mode():
            fused = blk.apply(params, x)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_param_tree_unchanged(self):
        """fused_tail must not change the param tree (converter contract)."""
        from vitslam_tpu.nn.layers import Block

        x = jnp.zeros((1, 8, 64), jnp.float32)
        kw = dict(dim=64, num_heads=2, qk_norm=False, rope=None,
                  init_values=0.01, dtype=jnp.float32)
        p0 = Block(**kw).init(jax.random.PRNGKey(0), x)
        p1 = Block(**kw, fused_tail=True).init(jax.random.PRNGKey(0), x)
        t0 = jax.tree_util.tree_structure(p0)
        t1 = jax.tree_util.tree_structure(p1)
        assert t0 == t1
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_small_rows_fall_back(self, monkeypatch):
        """Below _TAIL_MIN_ROWS the fused path must not engage (the
        alignment head's small token sets stay on the differentiable
        path)."""
        from vitslam_tpu.nn.layers import Block

        monkeypatch.setenv("VITSLAM_MLP_TAIL", "1")
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64)),
                        jnp.float32)
        blk = Block(dim=64, num_heads=2, qk_norm=False, rope=None,
                    dtype=jnp.float32, fused_tail=True)
        params = blk.init(jax.random.PRNGKey(0), x)
        out = blk.apply(params, x)  # no interpret ctx: kernel would crash
        assert np.isfinite(np.asarray(out)).all()

    def test_tail_backward_matches_reference_grad(self):
        """mlp_tail's custom VJP (XLA-recompute backward) vs grads of the
        plain reference math."""
        from vitslam_tpu.ops.mlp_tail import mlp_tail, mlp_tail_reference

        rng = np.random.default_rng(5)
        m, f, c = 256, 512, 256
        args = [jnp.asarray(rng.normal(size=s) * sc, jnp.float32)
                for s, sc in (((m, f), 1), ((f, c), 0.05), ((c,), 0.1),
                              ((m, c), 1), ((c,), 0.1), ((c,), 0.1))]

        def loss_k(h, w2, b2, res, g, b):
            with pltpu.force_tpu_interpret_mode():
                x, y = mlp_tail(h, w2, b2, res, g, b, gelu=True,
                                block_m=128, block_k=256)
            return jnp.sum(x * x) + jnp.sum(y)

        def loss_r(h, w2, b2, res, g, b):
            x, y = mlp_tail_reference(h, w2, b2, res, g, b, gelu=True)
            return jnp.sum(x * x) + jnp.sum(y)

        gk = jax.grad(loss_k, argnums=(0, 1, 3, 4))(*args)
        gr = jax.grad(loss_r, argnums=(0, 1, 3, 4))(*args)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3)


class TestSoftmaxShiftModes:
    """VITSLAM_SOFTMAX_SUB: the bounded-softmax shift subtraction is pure
    overflow protection — exp2(s - shift) and exp2(s) must produce the
    same attention output (shift cancels in acc/l) and the same lse
    (l_nosub = l_sub * 2^shift), across all three bounded kernels."""

    def _both(self, fn, monkeypatch):
        outs = {}
        for mode in ("1", "0"):
            monkeypatch.setenv("VITSLAM_SOFTMAX_SUB", mode)
            with pltpu.force_tpu_interpret_mode():
                outs[mode] = fn()
        return outs["1"], outs["0"]

    def test_fused_qkv_both_modes_agree(self, monkeypatch):
        h, dh = 2, 32
        qkv, cos, sin, q_ln, k_ln = _mk(640, h, dh)
        a, b = self._both(
            lambda: fused_qkv_attention(qkv, num_heads=h, cos=cos, sin=sin,
                                        q_ln=q_ln, k_ln=k_ln, static_max=8.0),
            monkeypatch)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3)

    def test_flat_flash_both_modes_agree(self, monkeypatch):
        from vitslam_tpu.ops.fused_attention import flat_flash_attention

        rng = np.random.default_rng(11)
        C = 128
        q = jnp.asarray(rng.normal(size=(1, 650, C)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 650, C)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, 650, C)), jnp.float32)
        a, b = self._both(
            lambda: flat_flash_attention(q, k, v, num_heads=2,
                                         static_max=16.0, block_q=256,
                                         block_k=256),
            monkeypatch)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3)

    def test_flash_bounded_lse_both_modes_agree(self, monkeypatch):
        """lse must be the SAME value either way: the backward kernels
        reconstruct p = exp2(s - lse) from it."""
        from vitslam_tpu.ops.flash_attention import _flash_forward

        rng = np.random.default_rng(5)
        d = 64
        q = jnp.asarray(rng.normal(size=(2, 300, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(2, 300, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(2, 300, d)), jnp.bfloat16)
        smax = jnp.asarray([16.0], jnp.float32)

        outs = {}
        for mode in ("1", "0"):
            monkeypatch.setenv("VITSLAM_SOFTMAX_SUB", mode)
            with pltpu.force_tpu_interpret_mode():
                outs[mode] = _flash_forward(q, k, v, smax, 1.0 / np.sqrt(d),
                                            1024, 1024, True, with_lse=True)
        (o1, lse1), (o0, lse0) = outs["1"], outs["0"]
        np.testing.assert_allclose(np.asarray(o1, np.float32),
                                   np.asarray(o0, np.float32),
                                   atol=5e-3, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(lse1), np.asarray(lse0),
                                   atol=1e-3, rtol=1e-3)

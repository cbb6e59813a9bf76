"""Shape/dtype/finiteness tests for the backbone + heads on tiny configs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitslam_tpu.models import (
    Aggregator, AlignmentHead, CameraHead, DPTHead, TrackHead,
)

# tiny config: 28x42 images, patch 14 -> 2x3=6 patches
H, W, PS = 28, 42, 14
B, S = 1, 3
EMBED = 32
DIM_IN = 2 * EMBED


@pytest.fixture(scope="module")
def agg_out():
    model = Aggregator(
        img_size=H, patch_size=PS, embed_dim=EMBED, depth=2, num_heads=4,
        patch_embed_depth=1, patch_embed_heads=4,
        intermediate_layers=(0, 1, 1, 1), dtype=jnp.float32,
    )
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(size=(B, S, 3, H, W)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), imgs)
    taps, psi = model.apply(params, imgs)
    return model, taps, psi, imgs


class TestAggregator:
    def test_output_shapes(self, agg_out):
        _, taps, psi, _ = agg_out
        assert psi == 5  # 1 camera + 4 register
        P = psi + (H // PS) * (W // PS)
        assert len(taps) == 4
        for t in taps:
            assert t.shape == (B, S, P, DIM_IN)
            assert np.isfinite(np.asarray(t)).all()

    def test_first_frame_tokens_distinct(self, agg_out):
        # the camera token variants differ between frame 0 and others at init
        model, taps, psi, imgs = agg_out
        # identical image content for all frames -> difference must come
        # from the first-frame token variant / global attention
        same = jnp.broadcast_to(imgs[:, :1], imgs.shape)
        params = model.init(jax.random.PRNGKey(1), same)
        taps2, _ = model.apply(params, same)
        t = np.asarray(taps2[-1])
        assert not np.allclose(t[0, 0], t[0, 1], atol=1e-6)


class TestCameraHead:
    def test_iterative_refinement(self, agg_out):
        _, taps, _, _ = agg_out
        cam_tokens = taps[-1][:, :, 0, :]
        head = CameraHead(dim_in=DIM_IN, trunk_depth=1, num_heads=4,
                          num_iters=3, dtype=jnp.float32)
        params = head.init(jax.random.PRNGKey(0), cam_tokens)
        preds = head.apply(params, cam_tokens)
        assert len(preds) == 3
        for p in preds:
            assert p.shape == (B, S, 9)
            assert p.dtype == jnp.float32


class TestDPTHead:
    def test_depth_head(self, agg_out):
        _, taps, psi, imgs = agg_out
        head = DPTHead(dim_in=DIM_IN, output_dim=2, features=16,
                       out_channels=(16, 16, 16, 16), activation="exp",
                       patch_size=PS, dtype=jnp.float32)
        params = head.init(jax.random.PRNGKey(0), taps, imgs, psi)
        dmap, conf = head.apply(params, taps, imgs, psi)
        assert dmap.shape == (B, S, H, W, 1)
        assert conf.shape == (B, S, H, W)
        assert (np.asarray(dmap) > 0).all()  # exp activation
        assert (np.asarray(conf) >= 1).all()  # expp1

    def test_point_head_inv_log(self, agg_out):
        _, taps, psi, imgs = agg_out
        head = DPTHead(dim_in=DIM_IN, output_dim=4, features=16,
                       out_channels=(16, 16, 16, 16), activation="inv_log",
                       patch_size=PS, dtype=jnp.float32)
        params = head.init(jax.random.PRNGKey(0), taps, imgs, psi)
        pmap, conf = head.apply(params, taps, imgs, psi)
        assert pmap.shape == (B, S, H, W, 3)
        assert np.isfinite(np.asarray(pmap)).all()


class TestTrackHead:
    def test_tracks(self, agg_out):
        _, taps, psi, imgs = agg_out
        head = TrackHead(dim_in=DIM_IN, patch_size=PS, features=16,
                         iters=2, corr_levels=2, hidden_size=64,
                         updater_depth=1, dtype=jnp.float32)
        q = jnp.asarray([[[10.0, 12.0], [20.0, 5.0]]])
        params = head.init(jax.random.PRNGKey(0), taps, imgs, psi, q)
        tracks, vis, conf = head.apply(params, taps, imgs, psi, q)
        assert tracks.shape == (B, S, 2, 2)
        assert vis.shape == (B, S, 2)
        assert np.isfinite(np.asarray(tracks)).all()


class TestAlignmentHead:
    def make(self):
        return AlignmentHead(
            patch_size=PS, in_dim=DIM_IN, embed_dim=32, dec_dim=16,
            depth_aa=2, depth_decoder=1, num_heads=4,
            num_memory_tokens=4, dtype=jnp.float32,
        )

    def test_first_chunk(self, agg_out):
        _, taps, psi, _ = agg_out
        head = self.make()
        params = head.init(
            jax.random.PRNGKey(0), taps[-1], (H, W), 1,
        )
        sim3, se3, mem, ovl = head.apply(params, taps[-1], (H, W), 1)
        assert sim3.shape == (B, 1, 8)
        assert se3.shape == (B, S - 1, 7)
        assert mem.shape == (B, 4, 16)
        P = 1 + psi + (H // PS) * (W // PS)
        assert ovl.shape == (B, 2, P, 32)  # 1 first-frame col + 1 overlap
        assert (np.asarray(sim3[..., -1]) > 0).all()  # exp scale
        # memory tokens unit-norm
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(mem), axis=-1), 1.0, rtol=1e-5
        )

    def test_chained_chunks(self, agg_out):
        _, taps, psi, _ = agg_out
        head = self.make()
        params = head.init(jax.random.PRNGKey(0), taps[-1], (H, W), 2)
        sim3, se3, mem, ovl = head.apply(params, taps[-1], (H, W), 2)
        assert ovl.shape[1] == 3  # 1 + overlap 2
        # feed overlap + memory into the next chunk
        sim3b, se3b, mem2, ovl2 = head.apply(
            params, taps[-1], (H, W), 1, ovl, mem
        )
        assert sim3b.shape == (B, 1, 8)
        assert np.isfinite(np.asarray(sim3b)).all()
        assert ovl2.shape[1] == 2

    def test_global_mode(self, agg_out):
        _, taps, psi, _ = agg_out
        head = AlignmentHead(
            patch_size=PS, in_dim=DIM_IN, embed_dim=32, dec_dim=16,
            depth_aa=2, depth_decoder=1, num_heads=4,
            num_memory_tokens=0, temporal_attention=False, dtype=jnp.float32,
        )
        params = head.init(jax.random.PRNGKey(0), taps[-1], (H, W), 1)
        sim3, se3, mem, ovl = head.apply(params, taps[-1], (H, W), 1)
        assert mem is None
        sim3b, _, _, _ = head.apply(params, taps[-1], (H, W), 1, ovl, None)
        assert np.isfinite(np.asarray(sim3b)).all()

    def test_dropout_train_mode(self, agg_out):
        _, taps, psi, _ = agg_out
        head = self.make()
        params = head.init(jax.random.PRNGKey(0), taps[-1], (H, W), 1)
        _, _, mem, ovl = head.apply(params, taps[-1], (H, W), 1)
        out1 = head.apply(
            params, taps[-1], (H, W), 1, ovl, mem, True,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert np.isfinite(np.asarray(out1[0])).all()


class TestTokenMergedGlobalAttention:
    """Opt-in KV-compressed global attention (models/aggregator.py
    merge_pool/merge_stride): anchors keep full K/V, non-anchors pool.
    With stride 1 every frame is an anchor, so the merged path must be
    numerically IDENTICAL to exact attention (same token set, same order)
    — this pins the kv plumbing (shared qkv projection, per-set RoPE
    cache). A real merge config must change only what tokens attend to."""

    def _encode(self, **merge):
        from vitslam_tpu.models import PointAlignedVGGT
        from vitslam_tpu.utils.testing import (
            make_synthetic_batch, tiny_model_kwargs,
        )

        kw = tiny_model_kwargs(enable_depth=False)
        model = PointAlignedVGGT(**kw, **merge)
        batch = make_synthetic_batch(B=1, N=6, H=28, W=42, seed=5)
        images = jnp.asarray(batch["images"])
        params = PointAlignedVGGT(**kw).init(
            jax.random.PRNGKey(0), images, 1)
        return model.apply(params, images, method=model.encode_chunks)

    def test_all_anchor_merge_is_exact(self):
        exact = self._encode()
        merged = self._encode(global_merge_pool=2, global_merge_stride=1)
        for k in exact:
            np.testing.assert_allclose(
                np.asarray(merged[k], np.float32),
                np.asarray(exact[k], np.float32), atol=1e-5, err_msg=k)

    def test_merged_shapes_and_finite(self):
        exact = self._encode()
        merged = self._encode(global_merge_pool=2, global_merge_stride=3)
        for k in exact:
            assert merged[k].shape == exact[k].shape, k
            assert bool(jnp.all(jnp.isfinite(
                jnp.asarray(merged[k], jnp.float32)))), k

    def test_feature_aligned_merge_knobs(self):
        """FeatureAlignedVGGT exposes the same opt-in merge knobs (round 5,
        for the trained-checkpoint KV-merge quality sweep): the merge is
        parameter-free, so exact-trained params load into a merged model
        unchanged, stride-1 stays bit-identical, and a real merge config
        still produces finite same-shaped outputs."""
        from vitslam_tpu.models import FeatureAlignedVGGT
        from vitslam_tpu.utils.testing import (
            make_synthetic_batch, tiny_model_kwargs,
        )

        kw = tiny_model_kwargs()
        images = jnp.asarray(
            make_synthetic_batch(B=1, N=4, H=28, W=42, seed=5)["images"])
        params = FeatureAlignedVGGT(**kw).init(
            jax.random.PRNGKey(0), images, 1)
        outs = {}
        for tag, merge in (
            ("exact", {}),
            ("anchor", dict(global_merge_pool=2, global_merge_stride=1)),
            ("real", dict(global_merge_pool=2, global_merge_stride=2)),
        ):
            model = FeatureAlignedVGGT(**kw, **merge)
            out, _ = model.apply(params, images, 1, None, None, False)
            outs[tag] = out
        for k in ("pose_enc", "depth", "world_points"):
            np.testing.assert_allclose(
                np.asarray(outs["anchor"][k], np.float32),
                np.asarray(outs["exact"][k], np.float32), atol=1e-5,
                err_msg=k)
            assert outs["real"][k].shape == outs["exact"][k].shape, k
            assert np.isfinite(
                np.asarray(outs["real"][k], np.float32)).all(), k


class TestRematPath:
    """remat=True over the rope-cache-carrying blocks: the cache's nsplit
    must stay a static int through the nn.remat/jax.checkpoint boundary
    (nn/rope.py::StaticDim). Regression for the round-3 find that a traced
    nsplit broke every remat'd forward since the rope-cache hoist."""

    def test_remat_forward_and_grad(self):
        from vitslam_tpu.models import FeatureAlignedVGGT
        from vitslam_tpu.utils.testing import (
            make_synthetic_batch, tiny_model_kwargs,
        )

        m = FeatureAlignedVGGT(**tiny_model_kwargs(), remat=True)
        imgs = jnp.asarray(make_synthetic_batch(B=1, N=2, H=28, W=42)["images"])
        params = m.init(jax.random.PRNGKey(0), imgs, 1)
        out, _ = m.apply(params, imgs, 1, None, None, False)
        assert np.isfinite(np.asarray(out["pose_enc"], np.float32)).all()

        def loss(p):
            o, _ = m.apply(p, imgs, 1, None, None, True,
                           rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(o["pose_enc"].astype(jnp.float32))

        g = jax.grad(loss)(params)
        total = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))), g, 0.0)
        assert np.isfinite(float(total))

"""End-to-end chunk-and-align tests for the three model variants on tiny
configs, plus chunk scheduler edge cases (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitslam_tpu.models import (
    FeatureAlignedVGGT, PointAlignedVGGT, PoseAlignedVGGT,
)
from vitslam_tpu.slam import (
    ChunkedPipeline, generate_chunks, merge_chunk_outputs,
    normalize_extrinsics_and_points,
)
from vitslam_tpu.utils.testing import make_synthetic_batch, tiny_model_kwargs

H, W = 28, 42


class TestGenerateChunks:
    def test_chunk_overlap_basic(self):
        idx = generate_chunks(9, "chunk_overlap", 5, 1)
        assert idx[0] == [0, 1, 2, 3, 4]
        assert idx[1] == [4, 5, 6, 7, 8]

    def test_chunk_overlap_remainder(self):
        idx = generate_chunks(10, "chunk_overlap", 5, 1)
        # stride 4: [0..4], [4..8], remainder [8, 9]
        assert idx[-1][-1] == 9
        assert all(i < 10 for c in idx for i in c)
        # every frame covered
        assert set(range(10)) == {i for c in idx for i in c}

    def test_short_sequence_single_chunk(self):
        idx = generate_chunks(3, "chunk_overlap", 5, 1)
        assert idx == [[0, 1, 2]]

    def test_chunk_gt_remainder(self):
        idx = generate_chunks(11, "chunk_gt", 4, 0)
        assert idx[-1] == [8, 9, 10]
        assert set(range(11)) == {i for c in idx for i in c}

    def test_all(self):
        assert generate_chunks(7, "all", 5, 1) == [list(range(7))]

    def test_two_chunks_disjoint(self):
        import random
        idx = generate_chunks(10, "two_chunks", 5, 1, rng=random.Random(0))
        assert len(idx) == 2
        assert sorted(idx[0] + idx[1]) == list(range(10))


class TestMerge:
    def test_merge_dedups_overlap(self):
        a = {"pose_enc": np.zeros((1, 5, 9)), "chunk_sim3_enc": np.zeros((1, 1, 8))}
        b = {"pose_enc": np.ones((1, 5, 9)), "chunk_sim3_enc": np.ones((1, 1, 8))}
        m = merge_chunk_outputs([a, b], overlap=2)
        assert m["pose_enc"].shape == (1, 8, 9)
        assert m["chunk_sim3_enc"].shape == (1, 2, 8)

    def test_normalize_first_frame_identity(self):
        batch = make_synthetic_batch(N=4, H=H, W=W)
        e, _, wp, _ = normalize_extrinsics_and_points(
            jnp.asarray(batch["extrinsics"]),
            world_points=jnp.asarray(batch["world_points"]),
        )
        np.testing.assert_allclose(
            np.asarray(e[:, 0]), np.tile(np.eye(4)[:3], (1, 1, 1)), atol=1e-5
        )


def _run_variant(model_cls, gt_alignment, extra=None, n=7, width=4, overlap=1):
    kw = tiny_model_kwargs(**(extra or {}))
    model = model_cls(**kw)
    batch = make_synthetic_batch(B=1, N=n, H=H, W=W)
    pipe = ChunkedPipeline(model)
    pipe.init_params(
        jax.random.PRNGKey(0), jnp.asarray(batch["images"][:, :width]), overlap
    )
    preds, merged_batch = pipe.run_sequence(
        batch, sample_mode="chunk_overlap", chunk_width=width,
        num_overlap=overlap, gt_alignment_type=gt_alignment,
    )
    return preds, merged_batch


class TestFeatureAligned:
    def test_end_to_end_scale_from_depths(self):
        preds, mb = _run_variant(
            FeatureAlignedVGGT, "scale_from_depths",
            extra=dict(num_memory_tokens=4, align_embed_dim=32, align_dec_dim=16),
        )
        assert preds["pose_enc"].shape == (1, 7, 9)
        assert preds["depth"].shape == (1, 7, H, W, 1)
        assert preds["world_points"].shape == (1, 7, H, W, 3)
        assert np.asarray(mb["extrinsics"]).shape[1] == 7
        assert np.isfinite(np.asarray(preds["pose_enc"])).all()
        # chunk-axis keys: 2 chunks of width 4 (stride 3 over 7 frames)
        assert preds["chunk_sim3_enc"].shape[1] == 2

    def test_first_pose_near_identity(self):
        preds, _ = _run_variant(
            FeatureAlignedVGGT, "none",
            extra=dict(num_memory_tokens=4, align_embed_dim=32, align_dec_dim=16),
        )
        # first chunk pose was identity-aligned then transformed only by the
        # (near-identity at init) alignment outputs
        pe0 = np.asarray(preds["pose_enc"])[0, 0]
        assert np.linalg.norm(pe0[:3]) < 1.0


class TestPointAligned:
    @pytest.mark.quick  # the quick tier's one e2e variant (pytest -m quick)
    def test_end_to_end(self):
        preds, _ = _run_variant(
            PointAlignedVGGT, "sim3_from_points", n=6, width=4, overlap=2
        )
        assert preds["world_points"].shape == (1, 6, H, W, 3)
        assert preds["pose_enc"].shape == (1, 6, 9)
        assert np.isfinite(np.asarray(preds["world_points"])).all()
        assert "alignment_scales" in preds


class TestPoseAligned:
    def test_end_to_end(self):
        preds, _ = _run_variant(
            PoseAlignedVGGT, "scale_from_poses",
            extra=dict(enable_point=True), n=6, width=4, overlap=2,
        )
        assert preds["pose_enc"].shape == (1, 6, 9)
        assert preds["depth"].shape == (1, 6, H, W, 1)
        assert np.isfinite(np.asarray(preds["pose_enc"])).all()

    def test_pose_only_serving(self):
        # trajectory-only serving preset: camera head only, no DPT decode
        # (models/presets.py::flagship_pose_only shape contract)
        preds, _ = _run_variant(
            PoseAlignedVGGT, "scale_from_poses",
            extra=dict(enable_point=False, enable_depth=False),
            n=6, width=4, overlap=2,
        )
        assert preds["pose_enc"].shape == (1, 6, 9)
        assert np.isfinite(np.asarray(preds["pose_enc"])).all()
        assert "depth" not in preds and "world_points" not in preds

    def test_chunk_gt_mode(self):
        kw = tiny_model_kwargs()
        model = PoseAlignedVGGT(**kw)
        batch = make_synthetic_batch(B=1, N=8, H=H, W=W)
        pipe = ChunkedPipeline(model)
        pipe.init_params(
            jax.random.PRNGKey(0), jnp.asarray(batch["images"][:, :4]), 1
        )
        preds, mb = pipe.run_sequence(
            batch, sample_mode="chunk_gt", chunk_width=4, num_overlap=1,
            gt_alignment_type="none",
        )
        assert preds["pose_enc"].shape == (1, 8, 9)


class TestAlignmentTypes:
    def test_all_alignment_types_run(self):
        # one model/pipeline, all GT-alignment dispatcher branches applied to
        # the merged outputs (avoids 6x recompiles)
        from vitslam_tpu.slam import align_outputs

        preds, mb = _run_variant(
            PoseAlignedVGGT, "none", extra=dict(enable_point=False),
            n=6, width=4, overlap=1,
        )
        for atype in ["none", "scale_from_poses", "scale_from_fc_poses",
                      "per_frame_scale_from_poses", "scale_from_depths",
                      "sim3_from_poses"]:
            out = align_outputs(preds, mb, atype, seq_width=4,
                                image_size_hw=(H, W))
            assert np.isfinite(np.asarray(out["pose_enc"])).all(), atype


class TestPipelinedEncode:
    def test_pipelined_matches_sequential(self):
        # encode_batch>1 must be numerically identical to the sequential path
        kw = tiny_model_kwargs(num_memory_tokens=4, align_embed_dim=32,
                               align_dec_dim=16)
        model = FeatureAlignedVGGT(**kw)
        batch = make_synthetic_batch(B=1, N=9, H=H, W=W)
        seq = ChunkedPipeline(model)
        seq.init_params(jax.random.PRNGKey(0),
                        jnp.asarray(batch["images"][:, :4]), 1)
        pipe = ChunkedPipeline(model, seq.params, encode_batch=3)
        p1, _ = seq.run_sequence(batch, chunk_width=4, num_overlap=1,
                                 gt_alignment_type="none")
        p2, _ = pipe.run_sequence(batch, chunk_width=4, num_overlap=1,
                                  gt_alignment_type="none")
        for k in ("pose_enc", "depth", "world_points", "chunk_sim3_enc"):
            np.testing.assert_allclose(
                np.asarray(p1[k]), np.asarray(p2[k]), atol=2e-4,
                err_msg=k,
            )

    def test_pipelined_point_and_pose_variants(self):
        # point/pose variants also expose encode_chunks/align_chunk
        for cls, extra in ((PointAlignedVGGT, dict()),
                           (PoseAlignedVGGT, dict(enable_point=False))):
            kw = tiny_model_kwargs(**extra)
            model = cls(**kw)
            batch = make_synthetic_batch(B=1, N=7, H=H, W=W)
            seq = ChunkedPipeline(model)
            seq.init_params(jax.random.PRNGKey(0),
                            jnp.asarray(batch["images"][:, :4]), 1)
            pipe = ChunkedPipeline(model, seq.params, encode_batch=2)
            p1, _ = seq.run_sequence(batch, chunk_width=4, num_overlap=1,
                                     gt_alignment_type="none")
            p2, _ = pipe.run_sequence(batch, chunk_width=4, num_overlap=1,
                                      gt_alignment_type="none")
            np.testing.assert_allclose(
                np.asarray(p1["pose_enc"]), np.asarray(p2["pose_enc"]),
                atol=2e-4, err_msg=cls.__name__,
            )

"""End-to-end merge/metric parity oracle (VERDICT r2 Next #2).

Executes the reference's OWN chunk-result fusion
(aligned_vggt/utils/data.py::convertDictListsToTensors), GT-alignment
dispatcher (::alignAndConvertOutputs) and metric preparation
(training/training_metrics.py::Metrics.prepare_data_for_metrics) plus the
ATE/RPE/ScaleConsistency metrics (eval/trajectory_metrics.py) under the
torch shim on synthetic multi-chunk predictions, and asserts this repo's
merge_chunk_outputs + align_outputs + prepare_data_for_metrics +
eval/trajectory produce the same numbers.

This is the strongest parity proof the environment permits (no real
weights/data): if the merged-pipeline numerics drift from the reference
at ANY stage — overlap-drop rules, alignment solvers as dispatched (not
just in isolation), pose decode, point unprojection, masking, ICP prep,
or the metric formulas — a test here fails.
"""
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_shim import import_reference, install_metrics_shims

ref_data = import_reference("aligned_vggt.utils.data")

pytestmark = pytest.mark.quick

B, W_CHUNK, OVERLAP, H, W = 2, 5, 2, 28, 28
S_TOTAL = 11  # 3 chunks: [0..4], [3..7], [6..10] — no remainder


def _quat_normalize(q):
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _chunk_indices():
    return ref_data.generate_chunks(S_TOTAL, "chunk_overlap", W_CHUNK, OVERLAP)


def _make_gt(rng):
    """Synthetic GT batch in the reference's key layout (B, S_TOTAL, ...)."""
    quat = _quat_normalize(rng.normal(size=(B, S_TOTAL, 4)).astype(np.float32)
                           + np.array([0, 0, 0, 4], np.float32))
    from vitslam_tpu.geometry import quat_to_mat

    R = np.asarray(quat_to_mat(jnp.asarray(quat)))
    t = 0.5 * rng.normal(size=(B, S_TOTAL, 3, 1)).astype(np.float32)
    extr = np.concatenate([R, t], axis=-1)  # (B, S, 3, 4) w2c
    intr = np.zeros((B, S_TOTAL, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 30.0
    intr[..., 0, 2] = W / 2.0
    intr[..., 1, 2] = H / 2.0
    intr[..., 2, 2] = 1.0
    depths = (2.0 + rng.uniform(size=(B, S_TOTAL, H, W))).astype(np.float32)
    world_points = rng.normal(size=(B, S_TOTAL, H, W, 3)).astype(np.float32)
    point_masks = (rng.uniform(size=(B, S_TOTAL, H, W)) > 0.3)
    images = rng.uniform(size=(B, S_TOTAL, 3, H, W)).astype(np.float32)
    return {
        "extrinsics": extr, "intrinsics": intr, "depths": depths,
        "world_points": world_points, "point_masks": point_masks,
        "images": images,
    }


def _make_chunk_preds(rng, gt):
    """Per-chunk prediction dicts: GT-correlated (so alignment solvers are
    well-conditioned) with noise and a global scale offset."""
    chunks = []
    for ids in _chunk_indices():
        ids = np.asarray(ids)
        S = len(ids)
        pe = np.zeros((B, S, 9), np.float32)
        pe[..., :3] = 0.55 * gt["extrinsics"][:, ids][..., :3, 3] \
            + 0.02 * rng.normal(size=(B, S, 3))
        from vitslam_tpu.geometry import mat_to_quat

        q = np.asarray(mat_to_quat(jnp.asarray(gt["extrinsics"][:, ids][..., :3, :3])))
        pe[..., 3:7] = _quat_normalize(
            q + 0.01 * rng.normal(size=(B, S, 4)).astype(np.float32))
        pe[..., 7:] = 0.8 + 0.1 * rng.uniform(size=(B, S, 2))
        depth = 0.55 * gt["depths"][:, ids][..., None] \
            + 0.02 * rng.normal(size=(B, S, H, W, 1)).astype(np.float32)
        chunks.append({
            "pose_enc": pe,
            "pose_enc_list": [pe * 0.9, pe],  # iterative-refinement list
            "depth": depth.astype(np.float32),
            "depth_conf": np.exp(rng.normal(size=(B, S, H, W))
                                 ).astype(np.float32),
            "world_points": (0.55 * gt["world_points"][:, ids]
                             + 0.02 * rng.normal(size=(B, S, H, W, 3))
                             ).astype(np.float32),
            "world_points_conf": np.exp(rng.normal(size=(B, S, H, W))
                                        ).astype(np.float32),
            "images": gt["images"][:, ids],
        })
    return chunks


def _ref_merge_and_align(chunk_preds, gt, align_type):
    """Run the reference's alignAndConvertOutputs on torch copies."""
    preds_t = {}
    for key in chunk_preds[0]:
        if key == "pose_enc_list":
            preds_t[key] = [[torch.from_numpy(np.array(x)) for x in c[key]]
                            for c in chunk_preds]
        else:
            preds_t[key] = [torch.from_numpy(np.array(c[key]))
                            for c in chunk_preds]
    chunked_batch_t = {}
    for key, val in gt.items():
        chunked_batch_t[key] = [
            torch.from_numpy(np.array(val[:, np.asarray(ids)]))
            for ids in _chunk_indices()
        ]
    batch_t = {}
    ref_data.alignAndConvertOutputs(
        preds_t, batch_t, chunked_batch_t, align_type, W_CHUNK, OVERLAP)
    return preds_t, batch_t


def _our_merge_and_align(chunk_preds, gt, align_type):
    from vitslam_tpu.slam.chunking import chunk_batch, merge_chunk_outputs
    from vitslam_tpu.slam.gt_alignment import (
        align_outputs, per_chunk_scale_from_poses,
    )

    chunk_batches = chunk_batch(gt, _chunk_indices())
    preds = [dict(c) for c in chunk_preds]
    if align_type == "per_chunk_scale_from_poses":
        preds = per_chunk_scale_from_poses(preds, chunk_batches)
    merged_batch = merge_chunk_outputs(chunk_batches, OVERLAP)
    merged = merge_chunk_outputs(preds, OVERLAP)
    merged = align_outputs(merged, merged_batch, align_type,
                           seq_width=W_CHUNK, image_size_hw=(H, W))
    return merged, merged_batch


class TestMergeParity:
    """convertDictListsToTensors vs merge_chunk_outputs (data.py:54-87)."""

    def test_merge_all_keys(self):
        rng = np.random.default_rng(0)
        gt = _make_gt(rng)
        chunk_preds = _make_chunk_preds(rng, gt)
        ref_preds, ref_batch = _ref_merge_and_align(chunk_preds, gt, "none")
        ours, our_batch = _our_merge_and_align(chunk_preds, gt, "none")
        for key in ["pose_enc", "depth", "depth_conf", "world_points",
                    "world_points_conf", "images"]:
            np.testing.assert_allclose(
                np.asarray(ours[key]), ref_preds[key].numpy(),
                atol=1e-6, err_msg=key)
        # the nested pose_enc_list merges element-wise
        for i, ref_item in enumerate(ref_preds["pose_enc_list"]):
            np.testing.assert_allclose(
                np.asarray(ours["pose_enc_list"][i]), ref_item.numpy(),
                atol=1e-6, err_msg=f"pose_enc_list[{i}]")
        for key in ["extrinsics", "intrinsics", "depths", "world_points",
                    "point_masks", "images"]:
            np.testing.assert_allclose(
                np.asarray(our_batch[key], np.float32),
                ref_batch[key].numpy().astype(np.float32),
                atol=1e-6, err_msg=f"batch.{key}")
        assert np.asarray(ours["pose_enc"]).shape[1] == S_TOTAL


ALIGN_TYPES = [
    "none", "scale_from_poses", "scale_from_fc_poses",
    "per_frame_scale_from_poses", "per_chunk_scale_from_poses",
    "scale_from_depths", "sim3_from_poses", "sim3_from_points",
]


@pytest.fixture
def fix_reference_sim3_list_bug(monkeypatch):
    """The reference's umeyama_alignment_from_poses passes
    ``[predictions["pose_enc"]]`` (a python list) into apply_sim3_alignment,
    which immediately reads ``pose_encodings.device`` (alignment.py:366,470)
    — the reference's own sim3_from_poses path crashes as shipped. Unwrap
    the list around the original function (matching the evident intent:
    the caller indexes ``adjusted_pose_encs[0]``) so the rest of the
    reference code still executes verbatim."""
    ref_align = import_reference("aligned_vggt.utils.alignment")
    orig = ref_align.apply_sim3_alignment

    def fixed(transforms, scales, pose_encodings, images_size,
              points=None, depths=None):
        if isinstance(pose_encodings, list):
            enc, pts, dep = orig(transforms, scales, pose_encodings[0],
                                 images_size, points, depths)
            return [enc], pts, dep
        return orig(transforms, scales, pose_encodings, images_size,
                    points, depths)

    monkeypatch.setattr(ref_align, "apply_sim3_alignment", fixed)

    # Second shipped bug (alignment.py:417): umeyama_alignment_from_points
    # selects channel-LAST points -> (N, 3), then calls
    # ``umeyama(points.reshape(3, -1), ...)`` — a row-major coordinate
    # scramble, not a transpose (x/y/z of different points interleave).
    # Patch the module-level umeyama to unscramble 3xN inputs whose column
    # count matches that call shape; the poses path passes a true
    # .transpose() so unscrambling is only applied via a flag set around
    # the points dispatcher.
    orig_umeyama = ref_align.umeyama
    state = {"unscramble": False}

    def umeyama_maybe_unscramble(x, y, *a, **k):
        if state["unscramble"]:
            x = np.asarray(x).reshape(-1).reshape(-1, 3).T
            y = np.asarray(y).reshape(-1).reshape(-1, 3).T
        return orig_umeyama(x, y, *a, **k)

    orig_points = ref_align.umeyama_alignment_from_points

    def points_fixed(*a, **k):
        state["unscramble"] = True
        try:
            return orig_points(*a, **k)
        finally:
            state["unscramble"] = False

    monkeypatch.setattr(ref_align, "umeyama", umeyama_maybe_unscramble)
    # data.py star-imported its own bindings — patch those too
    data_mod = import_reference("aligned_vggt.utils.data")
    monkeypatch.setattr(data_mod, "umeyama_alignment_from_points",
                        points_fixed)
    yield


class TestAlignmentDispatchParity:
    """alignAndConvertOutputs (data.py:108-153) for every alignment type:
    the solvers AS DISPATCHED over the merged dict, not in isolation."""

    @pytest.mark.parametrize("align_type", ALIGN_TYPES)
    def test_align(self, align_type, fix_reference_sim3_list_bug):
        rng = np.random.default_rng(1)
        gt = _make_gt(rng)
        chunk_preds = _make_chunk_preds(rng, gt)
        ref_preds, _ = _ref_merge_and_align(chunk_preds, gt, align_type)
        ours, _ = _our_merge_and_align(chunk_preds, gt, align_type)
        # sim3 paths round-trip pose encodings through eigendecompositions;
        # tolerance is looser there
        tol = 1e-3 if align_type.startswith("sim3") else 1e-4
        for key in ["pose_enc", "depth", "world_points"]:
            ref_np = ref_preds[key].numpy()
            np.testing.assert_allclose(
                np.asarray(ours[key], np.float32), ref_np, atol=tol,
                rtol=1e-3, err_msg=f"{align_type}:{key}")


class TestPrepareDataParity:
    """Metrics.prepare_data_for_metrics (training_metrics.py:219-370) vs
    eval/prepare.py on the merged+aligned outputs, including the
    exponential/binary-search image-space ICP subsampling. Both sides share
    the JAX ICP primitive (reference_shim pytorch3d shim), so this compares
    the pose decode, unprojection, quantile mask and subsample logic."""

    def _prepped(self, align_type="scale_from_poses", max_points=2000):
        rng = np.random.default_rng(2)
        gt = _make_gt(rng)
        chunk_preds = _make_chunk_preds(rng, gt)
        ref_preds, ref_batch = _ref_merge_and_align(chunk_preds, gt, align_type)
        ours, our_batch = _our_merge_and_align(chunk_preds, gt, align_type)
        install_metrics_shims()
        ref_tm = import_reference("training.training_metrics")
        stub = types.SimpleNamespace(
            reconstruction_metrics=[object()], trajectory_metrics=[object()])
        ref_out = ref_tm.Metrics.prepare_data_for_metrics(
            stub, {k: v for k, v in ref_preds.items() if k != "pose_enc_list"},
            ref_batch, valid_point_quantile=0.25, max_points_icp=max_points)
        from vitslam_tpu.eval.prepare import prepare_data_for_metrics

        our_out = prepare_data_for_metrics(
            ours, our_batch, valid_point_quantile=0.25,
            max_points_icp=max_points)
        return ref_out, our_out

    def test_poses_and_points(self):
        (rp, rg, rpl, rgl), (op, og, opl, ogl) = self._prepped()
        np.testing.assert_allclose(np.asarray(op), rp.numpy(), atol=1e-4,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(og), rg.numpy(), atol=1e-5)
        assert len(rpl) == len(opl) == B
        for b in range(B):
            assert rgl[b].shape == ogl[b].shape
            np.testing.assert_allclose(np.asarray(ogl[b]), rgl[b].numpy(),
                                       atol=1e-5, err_msg=f"gt points b={b}")
            assert rpl[b].shape == opl[b].shape, (
                f"pred mask/subsample drift b={b}: "
                f"{rpl[b].shape} vs {opl[b].shape}")
            np.testing.assert_allclose(np.asarray(opl[b]), rpl[b].numpy(),
                                       atol=1e-3, rtol=1e-3,
                                       err_msg=f"pred points b={b}")


class TestTrajectoryMetricParity:
    """eval/trajectory_metrics.py ATE/RPE/ScaleConsistency vs
    eval/trajectory.py on identical pose sets (through the torchmetrics
    shim)."""

    def _poses(self):
        rng = np.random.default_rng(3)
        gt = _make_gt(rng)
        chunk_preds = _make_chunk_preds(rng, gt)
        ref_preds, ref_batch = _ref_merge_and_align(
            chunk_preds, gt, "scale_from_poses")
        install_metrics_shims()
        ref_tm = import_reference("training.training_metrics")
        stub = types.SimpleNamespace(
            reconstruction_metrics=[], trajectory_metrics=[object()])
        rp, rg, _, _ = ref_tm.Metrics.prepare_data_for_metrics(
            stub, {k: v for k, v in ref_preds.items()
                   if k != "pose_enc_list"}, ref_batch)
        return rp.reshape(-1, 4, 4), rg.reshape(-1, 4, 4)

    def test_ate(self):
        install_metrics_shims()
        ref_traj = import_reference("eval.trajectory_metrics")
        from vitslam_tpu.eval.trajectory import AbsoluteTrajectoryError

        rp, rg = self._poses()
        ref_m = ref_traj.AbsoluteTrajectoryError(detailed=True)
        ref_m.update(rp, rg)
        ref_res = ref_m.compute()
        my_m = AbsoluteTrajectoryError(detailed=True)
        my_m.update(rp.numpy(), rg.numpy())
        my_res = my_m.compute()
        for key in ["ate_rmse", "ate_mean", "ate_median", "ate_min",
                    "ate_max"]:
            assert my_res[key] == pytest.approx(ref_res[key], abs=1e-5), key
        # reference torch.std is Bessel-corrected, as is ours
        assert my_res["ate_std"] == pytest.approx(ref_res["ate_std"],
                                                  abs=1e-5)
        np.testing.assert_allclose(my_res["ate_rmse_per_dim"],
                                   ref_res["ate_rmse_per_dim"], atol=1e-5)

    def test_rpe(self):
        install_metrics_shims()
        ref_traj = import_reference("eval.trajectory_metrics")
        from vitslam_tpu.eval.trajectory import RelativePoseError

        rp, rg = self._poses()
        ref_m = ref_traj.RelativePoseError(delta=1, detailed=True)
        ref_m.update(rp, rg)
        ref_res = ref_m.compute()
        my_m = RelativePoseError(delta=1, detailed=True)
        my_m.update(rp.numpy(), rg.numpy())
        my_res = my_m.compute()
        for key in ref_res:
            if key in my_res:
                assert my_res[key] == pytest.approx(
                    ref_res[key], abs=1e-3), key

    def test_scale_consistency(self):
        install_metrics_shims()
        ref_traj = import_reference("eval.trajectory_metrics")
        from vitslam_tpu.eval.trajectory import ScaleConsistency

        rp, rg = self._poses()
        ref_m = ref_traj.ScaleConsistency()
        ref_m.update(rp, rg)
        ref_res = ref_m.compute()
        my_m = ScaleConsistency()
        my_m.update(rp.numpy(), rg.numpy())
        my_res = my_m.compute()
        (ref_val,) = [v for v in (ref_res.values()
                                  if isinstance(ref_res, dict)
                                  else [ref_res])]
        assert my_res["scale_var"] == pytest.approx(
            float(ref_val), rel=1e-4, abs=1e-6)

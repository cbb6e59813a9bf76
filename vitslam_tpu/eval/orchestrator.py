"""Metrics orchestrator — batch-level and full-sequence evaluation.

Behavior parity with training/training_metrics.py:20-731 (Metrics):
  * per-batch metrics on the chunked training-style outputs
    (compute_batch_metrics:105) with ICP-prepared point clouds capped at
    max_points_for_icp_batch (250k);
  * full-sequence evaluation on process 0 only: gather one random (or all)
    sequences (gather_sequences:527), stream the whole sequence through the
    chunk pipeline with fixed chunk width/overlap
    (apply_sequence_to_model:616), GT-align + merge, prepare (500k ICP cap)
    and plot ATE/RPE/Chamfer with per-sequence prefixes;
  * alignment-scale / per-frame/chunk transform magnitude / memory-token
    cosine-similarity diagnostics (log_additional_data:462);
  * viser visualization and .npy dumps (visualize_sequence:371,
    save_dict_for_visualization:410).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from ..config.loader import instantiate
from ..geometry import pose_encoding_to_extri, pose_encoding_to_extri_intri
from ..slam.chunking import normalize_extrinsics_and_points
from .prepare import prepare_data_for_metrics


def log_additional_data(pred: dict, log: dict) -> None:
    """Alignment diagnostics (training_metrics.py:462-524)."""
    if "alignment_scales" in pred:
        log["avg_alignment_scale"] = float(np.mean(np.asarray(pred["alignment_scales"])))
    if "frame_se3_enc" in pred:
        enc = np.asarray(pred["frame_se3_enc"])
        log["avg_per_frame_trans_norm"] = float(
            np.linalg.norm(enc[..., :3], axis=-1).mean()
        )
        q = enc[..., 3:7]
        q = q / np.clip(np.linalg.norm(q, axis=-1, keepdims=True), 1e-8, None)
        log["avg_per_frame_quat_magnitude"] = float(
            (2.0 * np.sqrt(np.clip(1 - q[..., -1] ** 2, 0, None))).mean()
        )
    if "chunk_sim3_enc" in pred:
        enc = np.asarray(pred["chunk_sim3_enc"])
        log["avg_per_chunk_trans_norm"] = float(
            np.linalg.norm(enc[..., :3], axis=-1).mean()
        )
        q = enc[..., 3:7]
        q = q / np.clip(np.linalg.norm(q, axis=-1, keepdims=True), 1e-8, None)
        log["avg_per_chunk_quat_magnitude"] = float(
            (2.0 * np.sqrt(np.clip(1 - q[..., -1] ** 2, 0, None))).mean()
        )
        if enc.shape[-1] == 8:
            log["avg_per_chunk_scale"] = float(enc[..., 7].mean())
    if "memory_tokens" in pred and pred["memory_tokens"] is not None:
        mem = np.asarray(pred["memory_tokens"])
        B, N = mem.shape[:2]
        if N > 1:
            m = mem / np.clip(np.linalg.norm(mem, axis=-1, keepdims=True), 1e-8, None)
            sim = np.einsum("bnd,bmd->bnm", m, m)
            off = sim * (1.0 - np.eye(N)[None])
            log["avg_memory_token_similarity"] = float(
                off.sum() / (B * N * (N - 1))
            )


def gather_sequences(datasets: Sequence, use_random_sequences: bool,
                     rng: Optional[np.random.Generator] = None) -> list:
    """(dataset, seq_index, seq_name, n_frames) tuples — one random, or all."""
    rng = rng or np.random.default_rng()
    out = []
    if use_random_sequences:
        ds = datasets[int(rng.integers(0, len(datasets)))]
        j = int(rng.integers(0, ds.sequence_list_len))
        out.append((ds, j, ds.get_seq_name(j), ds.seq_frame_num[j]))
    else:
        for ds in datasets:
            for j in range(ds.sequence_list_len):
                out.append((ds, j, ds.get_seq_name(j), ds.seq_frame_num[j]))
    return out


def get_sequence_data(dataset, seq_index: int, seq_name: str,
                      seq_num_frames: int) -> dict:
    """Whole-sequence fetch + first-frame-centric GT normalization
    (training_metrics.py:562-601; scale_by_points=False at both reference
    call sites)."""
    import jax.numpy as jnp

    seq = dataset.get_data(seq_index, -1, None, np.arange(seq_num_frames))
    batch = {k: np.asarray(v)[None] for k, v in seq.items()
             if isinstance(v, np.ndarray)}
    e, cam, world, depths = normalize_extrinsics_and_points(
        jnp.asarray(batch["extrinsics"]),
        cam_points=jnp.asarray(batch["cam_points"]),
        world_points=jnp.asarray(batch["world_points"]),
        depths=jnp.asarray(batch["depths"]),
        point_masks=jnp.asarray(batch["point_masks"]),
        scale_by_points=False,
    )
    batch["extrinsics"] = np.asarray(e)
    if world is not None:
        batch["world_points"] = np.asarray(world)
    batch["dataset_name"] = type(dataset).__name__
    batch["seq_name"] = seq["seq_name"]
    return batch


class Metrics:
    def __init__(
        self,
        mode: str = "test",
        overlap=(1, 1),
        chunk_width=(5, 5),
        gt_alignment_type: str = "scale_from_poses",
        full_seq_sample_mode: str = "chunk_overlap",
        use_random_sequences: bool = True,
        max_points_for_icp_batch: int = 250000,
        max_points_for_icp_full_seq: int = 500000,
        trajectory_metrics: Optional[list] = None,
        reconstruction_metrics: Optional[list] = None,
        visualize: bool = False,
        save_for_visualization: bool = False,
        log_dir: Optional[str] = None,
        **_,
    ):
        self.mode = mode
        self.num_overlap = overlap[0] if isinstance(overlap, (list, tuple)) else overlap
        self.chunk_width = chunk_width[0] if isinstance(chunk_width, (list, tuple)) else chunk_width
        # full ranges: validation samples width/overlap randomly within them
        # per val step, like the reference (run_model.py:294-316 with
        # val_chunk_width = cfg.metrics.chunk_width, :201-205)
        as_range = lambda v: (tuple(v) if isinstance(v, (list, tuple))
                              else (v, v))
        self.overlap_range = as_range(overlap)
        self.chunk_width_range = as_range(chunk_width)
        self.gt_alignment_type = gt_alignment_type
        self.full_seq_sample_mode = full_seq_sample_mode
        self.use_random_sequences = use_random_sequences
        self.max_points_for_icp_batch = max_points_for_icp_batch
        self.max_points_for_icp_full_seq = max_points_for_icp_full_seq
        self.visualize = visualize
        self.save_for_visualization = save_for_visualization
        self.log_dir = log_dir

        # multi-host: concatenate metric states across processes before
        # compute (the reference's dist_reduce_fx="cat" — SURVEY §5.8)
        gather_fn = None
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            def gather_fn(x):
                g = multihost_utils.process_allgather(x)
                return np.asarray(g).reshape((-1,) + x.shape[1:])

        def build(entries):
            out = []
            for e in entries or []:
                m = instantiate(e) if isinstance(e, dict) else e
                if gather_fn is not None and getattr(m, "_gather", None) is None:
                    m._gather = gather_fn
                out.append(m)
            return out

        self.trajectory_metrics = build(trajectory_metrics)
        self.reconstruction_metrics = build(reconstruction_metrics)

    # --- entry point --------------------------------------------------------
    def __call__(self, predictions: dict, batch: dict, pipeline,
                 datasets: Optional[Sequence] = None) -> tuple[dict, dict]:
        batch_metrics: dict = {}
        seq_metrics: dict = {}
        has_recon = len(self.reconstruction_metrics) > 0 and (
            "world_points" in predictions or "depth" in predictions
        )
        if self.trajectory_metrics or has_recon:
            batch_metrics = self.compute_batch_metrics(predictions, batch)
            if datasets and jax.process_index() == 0:
                seq_metrics = self.compute_full_sequence_metrics(datasets, pipeline)
            from ..parallel import sync_global_devices
            sync_global_devices("sequence_metrics")
        if self.visualize and datasets and jax.process_index() == 0:
            self.visualize_sequence(datasets[0], pipeline)
        return batch_metrics, seq_metrics

    def compute_batch_metrics(self, predictions: dict, batch: dict) -> dict:
        out: dict = {}
        log_additional_data(predictions, out)
        want_points = len(self.reconstruction_metrics) > 0 and (
            "world_points" in predictions or "depth" in predictions
        )
        pred_poses, gt_poses, pred_pts, gt_pts = prepare_data_for_metrics(
            predictions, batch, max_points_icp=self.max_points_for_icp_batch,
            want_points=want_points,
            want_poses=len(self.trajectory_metrics) > 0,
        )
        title = f"seq: {batch.get('seq_name', [''])[0]}"
        prefix = f"{self.log_dir}/batch_" if self.log_dir else None
        if self.trajectory_metrics:
            for metric in self.trajectory_metrics:
                for b in range(pred_poses.shape[0]):
                    metric.update(pred_poses[b], gt_poses[b])
                out.update(metric.compute())
                metric.reset()
                if prefix:
                    metric.plot(pred_poses[0], gt_poses[0], title, prefix)
        if want_points:
            for metric in self.reconstruction_metrics:
                for p, g in zip(pred_pts, gt_pts):
                    if len(p) and len(g):
                        metric.update(p, g)
                out.update(metric.compute())
                metric.reset()
                if prefix and len(pred_pts[0]) and len(gt_pts[0]):
                    metric.plot(pred_pts[0], gt_pts[0], title, prefix)
        return out

    def run_sequence(self, seq_data: dict, pipeline) -> dict:
        """Full-sequence streaming inference + GT alignment
        (apply_sequence_to_model:616-657)."""
        preds, _ = pipeline.run_sequence(
            seq_data, sample_mode=self.full_seq_sample_mode,
            chunk_width=self.chunk_width, num_overlap=self.num_overlap,
            gt_alignment_type=self.gt_alignment_type,
        )
        return preds

    def compute_full_sequence_metrics(self, datasets, pipeline,
                                      rng=None) -> dict:
        all_metrics: dict = {}
        for ds, j, seq_name, n_frames in gather_sequences(
            datasets, self.use_random_sequences, rng
        ):
            per_seq: dict = {}
            seq_data = get_sequence_data(ds, j, seq_name, n_frames)
            preds = self.run_sequence(seq_data, pipeline)
            log_additional_data(preds, per_seq)
            pred_poses, gt_poses, pred_pts, gt_pts = prepare_data_for_metrics(
                preds, seq_data,
                max_points_icp=self.max_points_for_icp_full_seq,
                want_points=len(self.reconstruction_metrics) > 0 and (
                    "world_points" in preds or "depth" in preds
                ),
                want_poses=len(self.trajectory_metrics) > 0,
            )
            title = f"{seq_data['dataset_name']}_seq[{seq_name}]"
            if self.use_random_sequences:
                prefix_key = "seq_metrics/"
                img_path = f"{self.log_dir}/seq_" if self.log_dir else None
            else:
                prefix_key = f"{seq_data['dataset_name']}_{seq_name}/"
                img_path = (
                    f"{self.log_dir}/[{seq_data['dataset_name']}_{seq_name}]_"
                    if self.log_dir else None
                )
            if self.save_for_visualization and img_path:
                self.save_dict_for_visualization(preds, seq_data, img_path)
            for metric in self.trajectory_metrics:
                res, _ = metric.plot(pred_poses[0], gt_poses[0], title, img_path)
                per_seq.update(res)
            if pred_pts is not None:
                for metric in self.reconstruction_metrics:
                    res, _ = metric.plot(pred_pts[0], gt_pts[0], title, img_path)
                    per_seq.update(res)
            for k, v in per_seq.items():
                all_metrics[prefix_key + k] = v
        return all_metrics

    # --- visualization -------------------------------------------------------
    @staticmethod
    def _viz_dict(preds: dict, seq_data: dict) -> dict:
        image_hw = tuple(np.asarray(seq_data["images"]).shape[-2:])
        pe = np.asarray(preds["pose_enc"])
        if pe.shape[-1] == 9:
            extr, intr = pose_encoding_to_extri_intri(pe, image_hw)
        else:
            extr = pose_encoding_to_extri(pe)[..., :3, :4]
            intr = np.asarray(seq_data["intrinsics"])
        out = {"extrinsic": np.asarray(extr)[0], "intrinsic": np.asarray(intr)[0]}
        if "images" not in preds:
            out["images"] = np.asarray(seq_data["images"])[0]
        for k in ("images", "world_points", "world_points_conf",
                  "depth", "depth_conf"):
            if k in preds:
                out[k] = np.asarray(preds[k])[0]
        return out

    def visualize_sequence(self, dataset, pipeline):
        seq_name = dataset.get_seq_name(0)
        seq_data = get_sequence_data(dataset, 0, seq_name,
                                     dataset.seq_frame_num[0])
        preds = self.run_sequence(seq_data, pipeline)
        from ..viz.viser_viz import viser_wrapper

        return viser_wrapper(self._viz_dict(preds, seq_data),
                             background_mode=False)

    def save_dict_for_visualization(self, preds: dict, seq_data: dict,
                                    save_path: str):
        np.save(f"{save_path}visualization_data.npy",
                self._viz_dict(preds, seq_data))
        gt = {
            "images": np.asarray(seq_data["images"])[0],
            "intrinsic": np.asarray(seq_data["intrinsics"])[0],
            "extrinsic": np.asarray(seq_data["extrinsics"])[0],
            "world_points": np.asarray(seq_data["world_points"])[0],
            "world_points_conf": np.asarray(seq_data["point_masks"])[0].astype(float),
            "depth": np.asarray(seq_data["depths"])[0][..., None],
        }
        gt["depth_conf"] = gt["world_points_conf"]
        np.save(f"{save_path}visualization_data_gt.npy", gt)

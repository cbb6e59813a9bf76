#!/usr/bin/env python
"""KV-merge quality gate (VERDICT r3 Next #5): sweep the opt-in global-
attention KV compression (VITSLAM_TOKEN_MERGE pool,stride — see
models/aggregator.py::_merged_kv) over the large-chunk 75/30 VKITTI
fixture sequence and record ATE / RPE / Chamfer DELTAS vs the exact path,
for both training-free variants (point- and pose-aligned).

Weights are synthetic (fixed-seed random init — real VGGT-1B weights are
unfetchable here, PARITY.md "verification gaps"), so absolute metric
values are not SLAM quality; the exact-vs-merged deltas measure how much
the approximation perturbs the full product pipeline (backbone -> heads ->
chunk merge -> GT alignment -> metrics). FPS per setting comes from the
TPU bench (scripts/tpu_batch_r4.sh, VITSLAM_TOKEN_MERGE sweep); this
script supplies the quality axis of the quality-vs-speed curve.

Usage: python scripts/kv_merge_quality.py [--frames 90] [--chunk 75]
           [--overlap 30] [--report docs/KV_MERGE_QUALITY.md]
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

# (pool, stride): non-anchor frames' patch KV average-pooled pool x pool;
# every stride-th frame stays exact. stride=1 would be bit-exact (tested in
# tests/test_models.py); the sweep covers the usable range.
SETTINGS = [None, (2, 5), (2, 10), (4, 5), (4, 10), (8, 10)]


def small_kwargs():
    import jax.numpy as jnp

    return dict(
        img_size=28, patch_size=14, embed_dim=64, depth=4, num_heads=2,
        patch_embed_depth=2, intermediate_layers=(0, 1, 2, 3),
        dtype=jnp.bfloat16, enable_camera=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/kv_merge_quality")
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--chunk", type=int, default=75)
    ap.add_argument("--overlap", type=int, default=30)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--report",
                    default=osp.join(REPO, "docs", "KV_MERGE_QUALITY.md"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", osp.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from vitslam_tpu.data.base import CommonConfig
    from vitslam_tpu.data.vkitti import VKittiDataset
    from vitslam_tpu.eval.orchestrator import get_sequence_data
    from vitslam_tpu.eval.prepare import prepare_data_for_metrics
    from vitslam_tpu.eval.reconstruction import ChamferDistanceMetrics
    from vitslam_tpu.eval.trajectory import (
        AbsoluteTrajectoryError, RelativePoseError,
    )
    from vitslam_tpu.models import PointAlignedVGGT, PoseAlignedVGGT
    from vitslam_tpu.slam.pipeline import ChunkedPipeline
    from vitslam_tpu.utils.fixtures import write_vkitti_fixture

    if osp.isdir(args.workdir):
        shutil.rmtree(args.workdir)
    root = osp.join(args.workdir, "vkitti")
    write_vkitti_fixture(root, scene="01", setting="clone",
                         n_frames=args.frames, hw=(56, 84), seed=7)
    cc = CommonConfig(img_size=28, patch_size=14, fix_aspect_ratio=1.0,
                      training=False)
    ds = VKittiDataset(cc, split="test", VKitti_DIR=root,
                       sequence_ids=["01"], settings=["clone"])
    seq = get_sequence_data(ds, 0, ds.get_seq_name(0), args.frames)

    kw = small_kwargs()
    families = {
        "point": (PointAlignedVGGT,
                  dict(kw, enable_depth=False, enable_point=True)),
        "pose": (PoseAlignedVGGT,
                 dict(kw, enable_depth=True, enable_point=False)),
    }
    ate, rpe, cham = (AbsoluteTrajectoryError(), RelativePoseError(),
                      ChamferDistanceMetrics())
    rows = []
    for fam, (cls, fkw) in families.items():
        exact_vals = None
        base_params = None
        for setting in SETTINGS:
            mkw = dict(fkw)
            if setting:
                mkw.update(global_merge_pool=setting[0],
                           global_merge_stride=setting[1])
            model = cls(**mkw)
            if base_params is None:
                import jax.numpy as jnp

                base_params = jax.jit(model.init, static_argnums=(2,))(
                    jax.random.PRNGKey(5),
                    jnp.zeros((1, args.chunk, 3, 28, 28), jnp.bfloat16),
                    args.overlap)
            pipeline = ChunkedPipeline(model, base_params)
            t0 = time.time()
            preds, _ = pipeline.run_sequence(
                seq, sample_mode="chunk_overlap", chunk_width=args.chunk,
                num_overlap=args.overlap,
                gt_alignment_type="scale_from_poses")
            pred_poses, gt_poses, pred_pts, gt_pts = (
                prepare_data_for_metrics(
                    preds, seq, max_points_icp=2000,
                    want_points=True, want_poses=True))
            vals = {}
            vals.update(ate.plot(pred_poses[0], gt_poses[0], "t", None)[0])
            vals.update(rpe.plot(pred_poses[0], gt_poses[0], "t", None)[0])
            if pred_pts is not None:
                vals.update(cham.plot(pred_pts[0], gt_pts[0], "t", None)[0])
            vals = {k: float(v) for k, v in vals.items()
                    if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
            tag = "exact" if setting is None else f"p{setting[0]}s{setting[1]}"
            if setting is None:
                exact_vals = vals
            rows.append((fam, tag, vals, time.time() - t0))
            print(f"[kvq] {fam}/{tag}: "
                  f"{ {k: round(v, 4) for k, v in vals.items()} }",
                  flush=True)

    # --- report -----------------------------------------------------------
    keys = ["ATE", "RPE_trans", "RPE_rot", "chamfer_distance"]

    def pick(vals, key):
        for k, v in vals.items():
            if key.lower() in k.lower():
                return v
        return None

    lines = [
        "# KV-merge quality sweep (synthetic weights, 75/30 fixture)",
        "",
        f"`python scripts/kv_merge_quality.py --frames {args.frames} "
        f"--chunk {args.chunk} --overlap {args.overlap}` — small random "
        "backbone (fixed seed), VKITTI fixture Scene01/clone, "
        f"{args.frames} frames, chunk {args.chunk}/{args.overlap}. "
        "Deltas are (merged - exact)/exact; FPS axis: see BENCH.md "
        "token-merge table (flagship, real TPU).",
        "",
        "**How to read this (random weights):** the sweep executes the "
        "FULL product pipeline (backbone -> heads -> chunk merge -> GT "
        "alignment -> ICP -> metrics) under every merge setting, so it "
        "gates *integration* and bounds the *perturbation scale*. The "
        "signed direction of the deltas is NOT quality evidence: random-"
        "weight predictions are chaos, and KV averaging smooths them, "
        "which trivially lowers relative-pose error here while inflating "
        "Chamfer. A real quality-vs-speed call needs converted VGGT-1B "
        "weights (PARITY.md \"verification gaps\"); until then the merge "
        "stays opt-in (`VITSLAM_TOKEN_MERGE`).",
        "",
        "| variant | setting | " + " | ".join(
            f"{k} (Δ%)" for k in keys) + " |",
        "|---|---|" + "---|" * len(keys),
    ]
    exacts = {fam: vals for fam, tag, vals, _ in rows if tag == "exact"}
    for fam, tag, vals, secs in rows:
        cells = []
        for k in keys:
            v, e = pick(vals, k), pick(exacts[fam], k)
            if v is None:
                cells.append("—")
            elif tag == "exact" or not e:
                cells.append(f"{v:.4f}")
            else:
                cells.append(f"{v:.4f} ({100 * (v - e) / e:+.1f}%)")
        lines.append(f"| {fam} | {tag} | " + " | ".join(cells) + " |")
    report = "\n".join(lines) + "\n"
    os.makedirs(osp.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        f.write(report)
    print(f"[kvq] report -> {args.report}")
    print(report)


if __name__ == "__main__":
    main()

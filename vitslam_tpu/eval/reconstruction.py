"""Reconstruction metrics: Chamfer distance / accuracy / completion.

Behavior parity with eval/reconstruction_metrics.py:11-153: bidirectional
K=1 nearest-neighbor distances (squared L2 or L1), optional max-dist clamp,
RMSE (on the sqrt'd distances? — the reference accumulates knn .dists which
are SQUARED for norm=2 and takes sqrt(mean(d**2)); we reproduce exactly),
chamfer = 0.5*acc + 0.5*comp. kNN runs on the tiled brute-force TPU search
instead of PyTorch3D CUDA.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.knn import nn_dists
from .trajectory import Metric


class ChamferDistanceMetrics(Metric):
    def __init__(self, norm: int = 2, max_dist: float | None = None,
                 rmse: bool = True, **kw):
        self.norm = norm
        self.max_dist = max_dist
        self.rmse = rmse
        super().__init__(**kw)

    def reset(self):
        self.pred_to_gt: list = []
        self.gt_to_pred: list = []

    def update(self, preds, target):
        """preds (Np, 3), target (Ng, 3) point clouds."""
        p = jnp.asarray(preds)
        g = jnp.asarray(target)
        d_pg = nn_dists(p, g, norm=self.norm)
        d_gp = nn_dists(g, p, norm=self.norm)
        if self.max_dist is not None:
            d_pg = jnp.clip(d_pg, max=self.max_dist)
            d_gp = jnp.clip(d_gp, max=self.max_dist)
        self.pred_to_gt.append(np.asarray(d_pg))
        self.gt_to_pred.append(np.asarray(d_gp))

    def compute(self) -> dict:
        pg = self._cat(self.pred_to_gt)
        gp = self._cat(self.gt_to_pred)
        if self.rmse:
            acc = float(np.sqrt((pg ** 2).mean())) if pg.size else 0.0
            comp = float(np.sqrt((gp ** 2).mean())) if gp.size else 0.0
            return {
                "chamfer_distance_rmse": 0.5 * acc + 0.5 * comp,
                "accuracy_rmse": acc,
                "completion_rmse": comp,
            }
        acc = float(pg.mean()) if pg.size else 0.0
        comp = float(gp.mean()) if gp.size else 0.0
        return {
            "chamfer_distance": 0.5 * acc + 0.5 * comp,
            "accuracy": acc,
            "completion": comp,
        }

    def plot(self, preds, target, title=None, outpath=None):
        from ..viz.plots import plot_chamfer_hist
        p = jnp.asarray(preds)
        g = jnp.asarray(target)
        d_pg = np.asarray(nn_dists(p, g, norm=self.norm))
        d_gp = np.asarray(nn_dists(g, p, norm=self.norm))
        if self.max_dist is not None:
            d_pg = np.clip(d_pg, None, self.max_dist)
            d_gp = np.clip(d_gp, None, self.max_dist)
        if self.rmse:
            acc = float(np.sqrt((d_pg ** 2).mean()))
            comp = float(np.sqrt((d_gp ** 2).mean()))
            res = {"chamfer_distance_rmse": 0.5 * acc + 0.5 * comp,
                   "accuracy_rmse": acc, "completion_rmse": comp}
        else:
            acc, comp = float(d_pg.mean()), float(d_gp.mean())
            res = {"chamfer_distance": 0.5 * acc + 0.5 * comp,
                   "accuracy": acc, "completion": comp}
        path = None
        if outpath:
            path = plot_chamfer_hist(d_pg, d_gp, res, title, outpath)
        return res, path

"""Trajectory metrics: ATE, RPE, ScaleConsistency.

Behavior parity with eval/trajectory_metrics.py:11-393 (torchmetrics classes
with dist_reduce_fx="cat" states). The TPU-native design separates the
pure-jnp error computation (jit/vmap-able, device-side) from host-side state
accumulation; in the data-parallel trainer, states are all-gathered across
the mesh before compute (the ``gather_fn`` hook).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import rotation_angle


def _median(x: np.ndarray) -> float:
    """torch.median semantics: the LOWER of the two middle values on
    even-length input (np.median averages them — reference parity:
    eval/trajectory_metrics.py:64,199,205 use torch.median)."""
    return float(np.sort(np.ravel(x))[(x.size - 1) // 2])


class Metric:
    """Minimal distributed-friendly metric: numpy list states + optional
    cross-process gather at compute time."""

    def __init__(self, gather_fn: Optional[Callable] = None):
        self._gather = gather_fn
        self.reset()

    def reset(self):
        raise NotImplementedError

    def _cat(self, xs: list[np.ndarray]) -> np.ndarray:
        if not xs:
            return np.zeros((0,), np.float32)
        x = np.concatenate([np.asarray(v).reshape(len(np.asarray(v)), -1)
                            if np.asarray(v).ndim > 1 else np.asarray(v)
                            for v in xs], axis=0)
        if self._gather is not None:
            x = self._gather(x)
        return x


def ate_errors(pred: jax.Array, target: jax.Array):
    """pred/target (N, 4, 4) c2w -> (trans_error (N,), per_dim (N, 3))."""
    delta = pred[:, :3, 3] - target[:, :3, 3]
    return jnp.linalg.norm(delta, axis=-1), delta


def rpe_errors(pred: jax.Array, target: jax.Array, delta: int = 1):
    """Relative pose errors at frame offset ``delta``:
    err = inv(gt_rel) @ pred_rel; translation norm + geodesic angle."""
    pred_rel = jnp.linalg.inv(pred[:-delta]) @ pred[delta:]
    gt_rel = jnp.linalg.inv(target[:-delta]) @ target[delta:]
    err = jnp.linalg.inv(gt_rel) @ pred_rel
    trans = jnp.linalg.norm(err[:, :3, 3], axis=-1)
    rot = rotation_angle(err[:, :3, :3])
    return trans, rot


def scale_factors(pred: jax.Array, target: jax.Array):
    """Per-frame LSE scale factors (first frame omitted — zero translation)."""
    p = pred[1:, :3, 3]
    g = target[1:, :3, 3]
    return jnp.sum(g * p, axis=-1) / jnp.sum(p * p, axis=-1).clip(1e-8)


class AbsoluteTrajectoryError(Metric):
    """RMSE of positional deltas; optional detailed stats + per-dim RMSE."""

    def __init__(self, detailed: bool = False, **kw):
        self.detailed = detailed
        super().__init__(**kw)

    def reset(self):
        self.errors: list = []
        self.per_dim: list = []

    def update(self, preds, target):
        e, pd = ate_errors(jnp.asarray(preds), jnp.asarray(target))
        self.errors.append(np.asarray(e))
        self.per_dim.append(np.asarray(pd))

    def compute(self) -> dict:
        e = self._cat(self.errors)
        pd = self._cat(self.per_dim).reshape(-1, 3)
        rmse = float(np.sqrt(np.mean(e ** 2))) if e.size else 0.0
        out = {"ate_rmse": rmse}
        if self.detailed and e.size:
            out.update(
                ate_mean=float(e.mean()), ate_median=_median(e),
                ate_std=float(e.std(ddof=1)) if e.size > 1 else 0.0,
                ate_min=float(e.min()), ate_max=float(e.max()),
                ate_rmse_per_dim=np.sqrt((pd ** 2).mean(axis=0)).tolist(),
            )
        return out

    def plot(self, preds, target, title=None, outpath=None):
        from ..viz.plots import plot_ate
        res = self.compute() if self.errors else None
        e, pd = ate_errors(jnp.asarray(preds), jnp.asarray(target))
        rmse = float(jnp.sqrt(jnp.mean(e ** 2)))
        per_dim = np.sqrt((np.asarray(pd) ** 2).mean(axis=0))
        path = None
        if outpath:
            path = plot_ate(
                np.asarray(preds)[:, :3, 3], np.asarray(target)[:, :3, 3],
                rmse, per_dim, title, outpath,
            )
        return {"ate_rmse": rmse}, path


class RelativePoseError(Metric):
    """RMSE of relative-pose translation (m) and rotation (deg) at offset
    ``delta``."""

    def __init__(self, delta: int = 1, detailed: bool = False, **kw):
        self.delta = delta
        self.detailed = detailed
        super().__init__(**kw)

    def reset(self):
        self.trans: list = []
        self.rot: list = []

    def update(self, preds, target):
        if preds.shape[0] <= self.delta:
            return
        t, r = rpe_errors(jnp.asarray(preds), jnp.asarray(target), self.delta)
        self.trans.append(np.asarray(t))
        self.rot.append(np.asarray(r))

    def compute(self) -> dict:
        t = self._cat(self.trans)
        r = self._cat(self.rot)
        out = {
            "rpe_trans_rmse": float(np.sqrt(np.mean(t ** 2))) if t.size else 0.0,
            "rpe_rot_rmse": float(np.degrees(np.sqrt(np.mean(r ** 2)))) if r.size else 0.0,
        }
        if self.detailed and t.size:
            out.update(
                rpe_trans_mean=float(t.mean()),
                rpe_trans_median=_median(t),
                rpe_trans_std=float(t.std(ddof=1)) if t.size > 1 else 0.0,
                rpe_trans_min=float(t.min()), rpe_trans_max=float(t.max()),
                rpe_rot_mean=float(np.degrees(r.mean())),
                rpe_rot_median=float(np.degrees(_median(r))),
                rpe_rot_std=float(np.degrees(r.std(ddof=1))) if r.size > 1 else 0.0,
                rpe_rot_min=float(np.degrees(r.min())),
                rpe_rot_max=float(np.degrees(r.max())),
            )
        return out

    def plot(self, preds, target, title=None, outpath=None):
        from ..viz.plots import plot_rpe
        t, r = rpe_errors(jnp.asarray(preds), jnp.asarray(target), self.delta)
        t = np.asarray(t)
        r = np.asarray(r)
        trans_rmse = float(np.sqrt((t ** 2).mean()))
        rot_rmse = float(np.degrees(np.sqrt((r ** 2).mean())))
        path = None
        if outpath:
            path = plot_rpe(t, np.degrees(r), trans_rmse, rot_rmse, title, outpath)
        return {"rpe_trans_rmse": trans_rmse, "rpe_rot_rmse": rot_rmse}, path


class ScaleConsistency(Metric):
    """Mean (over trajectories) variance of per-frame LSE scale factors."""

    def reset(self):
        self.var_sum = 0.0
        self.count = 0

    def update(self, preds, target):
        sf = np.asarray(scale_factors(jnp.asarray(preds), jnp.asarray(target)))
        self.var_sum += float(sf.var())
        self.count += 1

    def compute(self) -> dict:
        return {"scale_var": self.var_sum / self.count if self.count else 0.0}

    def plot(self, preds, target, title=None, outpath=None):
        from ..viz.plots import plot_scale_consistency
        sf = np.asarray(scale_factors(jnp.asarray(preds), jnp.asarray(target)))
        var = float(sf.var())
        path = None
        if outpath:
            path = plot_scale_consistency(sf, var, title, outpath)
        return {"scale_var": var}, path

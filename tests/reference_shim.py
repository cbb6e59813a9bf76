"""Parity-oracle support: install a minimal ``vggt`` package shim into
``sys.modules`` so the reference's pure-math modules (/root/reference,
read-only) can be *executed* with torch-cpu and compared numerically against
this repo's JAX implementations (VERDICT.md Next #3).

The shim's primitives (quat<->mat, SE(3) inverse, pose encodings, NaN
scrubbing) are thin torch wrappers around vitslam_tpu's own JAX functions,
so each oracle test compares the reference's *formula* (running in torch)
against this repo's formula while sharing only primitive conventions —
a drift in any re-derived solver/loss fails the test against the actual
reference code, not against a re-derivation.
"""
from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _wrap_jax(fn, n_outputs=1):
    """Expose a jax function as a torch-tensor function via numpy."""
    import torch
    import jax.numpy as jnp

    def to_jax(a):
        if isinstance(a, torch.Tensor):
            return jnp.asarray(a.detach().cpu().numpy())
        return a

    def to_torch(o):
        if o is None:
            return None
        return torch.from_numpy(np.asarray(o))

    def wrapped(*args, **kwargs):
        out = fn(*[to_jax(a) for a in args],
                 **{k: to_jax(v) for k, v in kwargs.items()})
        if isinstance(out, tuple):
            return tuple(to_torch(o) for o in out)
        return to_torch(out)

    return wrapped


def install_vggt_shim():
    """Create the ``vggt.*`` module tree the reference imports. Idempotent."""
    if "vggt" in sys.modules:
        return
    import jax

    jax.config.update("jax_platforms", "cpu")  # no-op if already set

    from vitslam_tpu.geometry import (
        closed_form_inverse_se3, extri_intri_to_pose_encoding,
        mat_to_quat, pose_encoding_to_extri_intri, quat_to_mat,
    )
    from vitslam_tpu.slam.chunking import check_and_fix_inf_nan

    def module(name):
        m = types.ModuleType(name)
        sys.modules[name] = m
        return m

    vggt = module("vggt")
    vggt_vggt = module("vggt.vggt")
    utils = module("vggt.vggt.utils")
    pose_enc = module("vggt.vggt.utils.pose_enc")
    rotation = module("vggt.vggt.utils.rotation")
    geometry = module("vggt.vggt.utils.geometry")
    training = module("vggt.training")
    train_utils = module("vggt.training.train_utils")
    general = module("vggt.training.train_utils.general")
    vggt.vggt = vggt_vggt
    vggt.training = training
    vggt_vggt.utils = utils
    utils.pose_enc = pose_enc
    utils.rotation = rotation
    utils.geometry = geometry
    training.train_utils = train_utils
    train_utils.general = general

    pose_enc.extri_intri_to_pose_encoding = _wrap_jax(
        lambda extr, intr=None, image_size_hw=None, **kw:
        extri_intri_to_pose_encoding(
            extr, intr,
            None if image_size_hw is None else tuple(image_size_hw)),
    )
    pose_enc.pose_encoding_to_extri_intri = _wrap_jax(
        lambda pe, image_size_hw=None, build_intrinsics=True, **kw:
        pose_encoding_to_extri_intri(
            pe, None if image_size_hw is None else tuple(image_size_hw),
            build_intrinsics=build_intrinsics),
    )
    rotation.quat_to_mat = _wrap_jax(quat_to_mat)
    rotation.mat_to_quat = _wrap_jax(mat_to_quat)
    geometry.closed_form_inverse_se3 = _wrap_jax(closed_form_inverse_se3)
    # public VGGT's check_and_fix_inf_nan clamps to [-hard_max, hard_max]
    # with a default of 100 (training/train_utils/general.py)
    general.check_and_fix_inf_nan = _wrap_jax(
        lambda t, name="t", hard_max=100.0: check_and_fix_inf_nan(
            t, name, None if hard_max is None else float(hard_max)),
    )


def install_metrics_shims():
    """Extra module shims so the reference's *metrics orchestrator*
    (training/training_metrics.py) can be imported and executed here:
    pytorch3d (Pointclouds + iterative_closest_point wrapping this repo's
    JAX ICP, so both sides share the ICP primitive and the test compares
    the masking/subsampling/unprojection orchestration), hydra.utils,
    torchmetrics.Metric, viser, and vggt.visual_util. Idempotent."""
    install_vggt_shim()
    import torch

    def module(name):
        m = types.ModuleType(name)
        sys.modules[name] = m
        return m

    if "pytorch3d" not in sys.modules:
        p3d = module("pytorch3d")
        structures = module("pytorch3d.structures")
        ops = module("pytorch3d.ops")
        p3d.structures = structures
        p3d.ops = ops

        class Pointclouds:
            def __init__(self, points):
                self._points = [torch.as_tensor(p) for p in points]

            def points_list(self):
                return list(self._points)

        def iterative_closest_point(X, Y, max_iterations=30):
            import jax.numpy as jnp

            from vitslam_tpu.eval.icp import (
                iterative_closest_point as jax_icp,
            )

            outs = []
            for p, g in zip(X.points_list(), Y.points_list()):
                sol = jax_icp(
                    jnp.asarray(p.detach().cpu().numpy()),
                    jnp.asarray(g.detach().cpu().numpy()),
                    iterations=max_iterations,
                )
                outs.append(torch.from_numpy(np.asarray(sol.transformed)))
            return types.SimpleNamespace(Xt=Pointclouds(outs))

        structures.Pointclouds = Pointclouds
        ops.iterative_closest_point = iterative_closest_point

    if "hydra" not in sys.modules:
        hydra = module("hydra")
        hydra_utils = module("hydra.utils")
        hydra.utils = hydra_utils

        def instantiate(cfg, **kw):
            raise NotImplementedError(
                "hydra.utils.instantiate shim: construct metrics directly"
            )

        hydra_utils.instantiate = instantiate

    if "torchmetrics" not in sys.modules:
        tm = module("torchmetrics")

        class Metric(torch.nn.Module):
            """Minimal torchmetrics.Metric: add_state registers plain
            attributes; list states append via update(); no DDP reduce."""

            def __init__(self, **kwargs):
                super().__init__()
                self._defaults = {}

            def add_state(self, name, default, dist_reduce_fx=None):
                self._defaults[name] = default
                setattr(self, name,
                        list(default) if isinstance(default, list)
                        else default.clone())

            def reset(self):
                for name, default in self._defaults.items():
                    setattr(self, name,
                            list(default) if isinstance(default, list)
                            else default.clone())

            def forward(self, *args, **kwargs):
                self.update(*args, **kwargs)
                return self.compute()

        tm.Metric = Metric

    if "viser" not in sys.modules:
        viser = module("viser")
        viser.transforms = module("viser.transforms")
        viser.ViserServer = None

    visual_util = sys.modules.get("vggt.visual_util")
    if visual_util is None:
        visual_util = module("vggt.visual_util")
        sys.modules["vggt"].visual_util = visual_util

        def _unavailable(*a, **k):
            raise RuntimeError("sky-seg is not available in the test env")

        visual_util.run_skyseg = _unavailable
        visual_util.download_file_from_url = _unavailable

    geometry = sys.modules["vggt.vggt.utils.geometry"]
    if not hasattr(geometry, "unproject_depth_map_to_point_map"):
        from vitslam_tpu.geometry import unproject_depth_to_points

        def unproject_depth_map_to_point_map(depth, extrinsics, intrinsics):
            import jax.numpy as jnp

            out = unproject_depth_to_points(
                jnp.asarray(np.asarray(depth)),
                jnp.asarray(np.asarray(extrinsics)),
                jnp.asarray(np.asarray(intrinsics)),
            )
            return np.asarray(out)

        geometry.unproject_depth_map_to_point_map = (
            unproject_depth_map_to_point_map
        )


def import_reference(dotted: str):
    """Import a reference module (e.g. 'aligned_vggt.utils.alignment') with
    the shim installed and /root/reference on sys.path."""
    install_vggt_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module(dotted)

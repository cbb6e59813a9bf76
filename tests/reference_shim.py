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


def import_reference(dotted: str):
    """Import a reference module (e.g. 'aligned_vggt.utils.alignment') with
    the shim installed and /root/reference on sys.path."""
    install_vggt_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module(dotted)

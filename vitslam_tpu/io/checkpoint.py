"""Checkpointing: msgpack pytree snapshots with the reference's crash-resume
semantics.

Reference parity (SURVEY.md §5.4, training/run_model.py:52-114, 377-418):
  * periodic step checkpoints named ``<exp>_step<k>.ckpt`` (the reference
    suffixes rank; JAX SPMD writes from process 0 only);
  * a stable ``_latest_checkpoints/<exp>.ckpt`` link updated every save and
    auto-resumed on restart, deleted on clean finish, with a guard against
    dangling links;
  * 3-tier model load — explicit checkpoint with ``model.`` prefix strip,
    fallback checkpoint filling missing keys (e.g. an AlignmentHead ckpt on
    top of VGGT-1B base weights), then strict structural check.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization, traverse_util


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, tree: Any) -> str:
    """Serialize a pytree of arrays to ``path`` (msgpack)."""
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    data = serialization.to_bytes(_to_host(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic
    return path


def load_checkpoint(path: str, target: Any = None) -> Any:
    """Load a pytree; with ``target`` restores into its structure/dtypes,
    else returns the raw nested state dict."""
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


class CheckpointManager:
    """Step checkpoints + stable `_latest_checkpoints/<exp>.ckpt` resume
    link (reference CustomModelCheckpoint, run_model.py:52-114)."""

    def __init__(self, save_dir: str, exp_name: str, save_freq: int = 500,
                 keep: int = 3):
        self.save_dir = save_dir
        self.exp_name = exp_name
        self.save_freq = save_freq
        self.keep = keep
        self.latest_dir = osp.join(save_dir, "_latest_checkpoints")
        self._saved: list[str] = []

    @property
    def latest_link(self) -> str:
        return osp.join(self.latest_dir, f"{self.exp_name}.ckpt")

    def maybe_save(self, step: int, tree: Any) -> Optional[str]:
        if step == 0 or step % self.save_freq != 0:
            return None
        return self.save(step, tree)

    def save(self, step: int, tree: Any) -> str:
        if jax.process_index() != 0:
            return ""
        path = osp.join(self.save_dir, f"{self.exp_name}_step{step}.ckpt")
        save_checkpoint(path, tree)
        os.makedirs(self.latest_dir, exist_ok=True)
        if osp.islink(self.latest_link) or osp.exists(self.latest_link):
            os.remove(self.latest_link)
        os.symlink(osp.abspath(path), self.latest_link)
        self._saved.append(path)
        while len(self._saved) > self.keep:
            old = self._saved.pop(0)
            if osp.exists(old):
                os.remove(old)
        return path

    def resume_path(self) -> Optional[str]:
        """Valid resume target or None (guards dangling links —
        run_model.py:99-103)."""
        link = self.latest_link
        if osp.islink(link):
            if osp.exists(link):
                return link
            os.remove(link)  # dangling
            return None
        return link if osp.exists(link) else None

    def finish(self):
        """Delete the resume link on clean completion (run_model.py:108-114)."""
        if jax.process_index() == 0 and (
            osp.islink(self.latest_link) or osp.exists(self.latest_link)
        ):
            os.remove(self.latest_link)


def _strip_prefix(flat: dict, prefix: str = "model.") -> dict:
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v
        for k, v in flat.items()
    }


def load_model_params(
    path: str,
    params_template: Any,
    fallback_path: Optional[str] = None,
    strict: Optional[bool] = None,
) -> Any:
    """3-tier parameter load (run_model.py:377-418): load ``path``, strip a
    leading ``model.`` key prefix, fill keys missing from ``path`` out of
    ``fallback_path``, and finally require every template leaf resolved
    (strict defaults to True when no fallback is given, as the reference)."""
    raw = load_checkpoint(path)
    flat = {"/".join(map(str, k)): v
            for k, v in traverse_util.flatten_dict(raw).items()}
    flat = _strip_prefix(flat, "model/")
    tmpl_flat = traverse_util.flatten_dict(
        serialization.to_state_dict(params_template)
    )
    tmpl_keys = {"/".join(map(str, k)): k for k in tmpl_flat}
    if strict is None:
        strict = fallback_path is None

    resolved = {}
    missing = []
    for key, tk in tmpl_keys.items():
        if key in flat:
            resolved[tk] = flat[key]
        else:
            missing.append(key)
    if missing and fallback_path is not None:
        fb = load_checkpoint(fallback_path)
        fb_flat = {"/".join(map(str, k)): v
                   for k, v in traverse_util.flatten_dict(fb).items()}
        fb_flat = _strip_prefix(fb_flat, "model/")
        still = []
        for key in missing:
            if key in fb_flat:
                resolved[tmpl_keys[key]] = fb_flat[key]
            else:
                still.append(key)
        missing = still
    if missing:
        if strict:
            raise KeyError(f"missing {len(missing)} params, e.g. {missing[:5]}")
        for key in missing:  # keep template values
            resolved[tmpl_keys[key]] = tmpl_flat[tmpl_keys[key]]
    state = traverse_util.unflatten_dict(resolved)
    return serialization.from_state_dict(params_template, state)

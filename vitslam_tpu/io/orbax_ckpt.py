"""Sharded (multi-host) checkpointing via orbax, with the reference's
crash-resume semantics on top.

The msgpack path (io/checkpoint.py) gathers the full tree to host 0 — fine
at 1 process, a non-starter at pod scale (VERDICT.md Missing #5; the
reference rank-suffixes torch files, training/run_model.py:78). Here every
process writes only its addressable shards (orbax/tensorstore handles the
cross-process commit protocol and atomic finalization), and restore places
shards directly onto each process's devices from a template's shardings —
no host gather in either direction.

Kept from the reference semantics (run_model.py:52-114):
  * step checkpoints ``<exp>_step<k>.orbax`` (directories, not files);
  * a stable ``_latest_checkpoints/<exp>.orbax`` symlink updated on every
    save, auto-resumed on restart, removed on clean ``finish()``;
  * ``keep`` most-recent pruning.

All processes must call save/load collectively (orbax barriers internally);
link bookkeeping runs on process 0 only.
"""
from __future__ import annotations

import os
import os.path as osp
import shutil
from typing import Any, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_sharded(path: str, tree: Any) -> str:
    """Collectively write ``tree`` (may contain multi-process sharded
    arrays) to directory ``path``."""
    ocp = _ocp()
    path = osp.abspath(path)
    if jax.process_index() == 0 and osp.exists(path):
        shutil.rmtree(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree)
    return path


def load_sharded(path: str, template: Any) -> Any:
    """Collectively restore from ``path``; each leaf lands with the
    sharding (and dtype/shape) of the corresponding ``template`` leaf —
    pass the live (or abstract) TrainState so shards go straight to the
    right devices."""
    ocp = _ocp()
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(osp.abspath(path), item=template,
                         restore_args=restore_args)


class ShardedCheckpointManager:
    """Drop-in sibling of io.checkpoint.CheckpointManager backed by orbax
    sharded saves (same save_freq/keep/_latest-link/resume/finish
    contract; paths are directories)."""

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
        return osp.join(self.latest_dir, f"{self.exp_name}.orbax")

    def maybe_save(self, step: int, tree: Any) -> Optional[str]:
        if step == 0 or step % self.save_freq != 0:
            return None
        return self.save(step, tree)

    def save(self, step: int, tree: Any) -> str:
        # collective: every process participates in the orbax write
        path = osp.join(self.save_dir, f"{self.exp_name}_step{step}.orbax")
        os.makedirs(self.save_dir, exist_ok=True)
        save_sharded(path, tree)
        if jax.process_index() == 0:
            os.makedirs(self.latest_dir, exist_ok=True)
            if osp.islink(self.latest_link) or osp.exists(self.latest_link):
                os.remove(self.latest_link)
            os.symlink(osp.abspath(path), self.latest_link)
            self._saved.append(path)
            while len(self._saved) > self.keep:
                old = self._saved.pop(0)
                if osp.isdir(old):
                    shutil.rmtree(old, ignore_errors=True)
        return path

    def resume_path(self) -> Optional[str]:
        link = self.latest_link
        if osp.islink(link):
            if osp.exists(link):
                return link
            if jax.process_index() == 0:
                os.remove(link)  # dangling
            return None
        return link if osp.isdir(link) else None

    def restore(self, template: Any) -> Optional[Any]:
        path = self.resume_path()
        if path is None:
            return None
        return load_sharded(osp.realpath(path), template)

    def finish(self):
        if jax.process_index() == 0 and (
            osp.islink(self.latest_link) or osp.exists(self.latest_link)
        ):
            os.remove(self.latest_link)

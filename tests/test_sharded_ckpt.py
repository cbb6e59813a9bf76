"""Multi-host-grade checkpointing (io/orbax_ckpt.py): a REAL 2-process
jax.distributed run on CPU — each process holds 2 of 4 global devices,
writes only its addressable shards, and restores through the `_latest`
resume link (reference crash-resume semantics, training/run_model.py:52-114
— the reference rank-suffixes torch files; here orbax coordinates the
collective write)."""
import os
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitslam_tpu.parallel import python_worker_argv, spawn_gang


def test_two_process_sharded_save_resume(tmp_path):
    worker = osp.join(osp.dirname(osp.abspath(__file__)),
                      "sharded_ckpt_worker.py")
    # port-retried gang launch (rendezvous races relaunch on a fresh port)
    # per-attempt subdir (keyed by the rendezvous port) so a retried gang
    # never restores a half-written checkpoint from the failed attempt
    outs, _ = spawn_gang(
        lambda pid, port: python_worker_argv(
            worker, pid, port, tmp_path / f"attempt_{port}"),
        num_processes=2, timeout=300.0, retries=2,
    )
    for i, out in enumerate(outs):
        assert f"worker {i}: OK" in out


@pytest.mark.quick
def test_single_process_sharded_roundtrip(tmp_path):
    """Same manager in-process on the 8-virtual-device mesh (quick tier)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vitslam_tpu.io.orbax_ckpt import ShardedCheckpointManager

    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    row = NamedSharding(mesh, P("dp"))
    x = jax.device_put(jnp.arange(16.0).reshape(4, 4), row)
    state = {"params": x, "step": jnp.asarray(7)}

    mgr = ShardedCheckpointManager(str(tmp_path), "exp", save_freq=1, keep=1)
    mgr.save(1, state)
    mgr.save(2, state)
    assert len([f for f in os.listdir(tmp_path) if f.endswith(".orbax")]) == 1

    restored = mgr.restore(jax.tree_util.tree_map(jnp.zeros_like, state))
    np.testing.assert_array_equal(np.asarray(restored["params"]),
                                  np.asarray(x))
    assert restored["params"].sharding.is_equivalent_to(row, 2)
    mgr.finish()
    assert mgr.resume_path() is None

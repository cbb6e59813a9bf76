"""Multi-host-grade checkpointing (io/orbax_ckpt.py): a REAL 2-process
jax.distributed run on CPU — each process holds 2 of 4 global devices,
writes only its addressable shards, and restores through the `_latest`
resume link (reference crash-resume semantics, training/run_model.py:52-114
— the reference rank-suffixes torch files; here orbax coordinates the
collective write)."""
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_save_resume(tmp_path):
    worker = osp.join(osp.dirname(osp.abspath(__file__)),
                      "sharded_ckpt_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
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

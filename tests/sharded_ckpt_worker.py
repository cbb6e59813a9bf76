"""Worker process for the 2-process sharded-checkpoint test (spawned by
test_sharded_ckpt.py): saves a dp-sharded train-state pytree through
ShardedCheckpointManager, restores it through the `_latest` resume link in a
fresh manager (the crash-resume path), and verifies values survive.

argv: <process_id> <coordinator_port> <workdir>
"""
import os
import sys


def main():
    pid, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vitslam_tpu.io.orbax_ckpt import ShardedCheckpointManager

    devs = np.array(jax.devices())
    assert devs.size == 4, f"expected 4 global devices, got {devs.size}"
    mesh = Mesh(devs, ("dp",))
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("dp"))

    params = np.arange(32, dtype=np.float32).reshape(4, 8)
    state = {
        "params": jax.make_array_from_callback(
            params.shape, row, lambda idx: params[idx]),
        "opt_mu": jax.make_array_from_callback(
            params.shape, row, lambda idx: 0.5 * params[idx]),
        "step": jax.device_put(jnp.asarray(500, jnp.int32), repl),
    }

    mgr = ShardedCheckpointManager(os.path.join(workdir, "ckpts"), "exp",
                                   save_freq=500, keep=2)
    assert mgr.maybe_save(499, state) is None
    path = mgr.maybe_save(500, state)
    assert path and os.path.isdir(path), path
    multihost_utils.sync_global_devices("saved")
    assert os.path.islink(mgr.latest_link)

    # crash-resume: a fresh manager finds the link and restores sharded
    mgr2 = ShardedCheckpointManager(os.path.join(workdir, "ckpts"), "exp",
                                    save_freq=500, keep=2)
    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = mgr2.restore(template)
    assert restored is not None

    got = np.asarray(multihost_utils.process_allgather(
        restored["params"], tiled=True))
    np.testing.assert_array_equal(got, params)
    got_mu = np.asarray(multihost_utils.process_allgather(
        restored["opt_mu"], tiled=True))
    np.testing.assert_array_equal(got_mu, 0.5 * params)
    assert int(restored["step"]) == 500
    # restored shards live on this process's devices with the row sharding
    assert restored["params"].sharding.is_equivalent_to(row, 2)

    mgr2.finish()
    multihost_utils.sync_global_devices("finished")
    assert mgr2.resume_path() is None
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()

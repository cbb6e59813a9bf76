"""Worker for the REAL 2-process training test (spawned by
tests/test_multiprocess_train.py): each process owns 2 of 4 global CPU
devices, the batch is sharded over a process-spanning 'data' mesh, and the
full jitted train step (chunk loop + multi-task loss + AdamW) runs with
cross-process gradient reduction — the reference's multi-node DDP
(training/run_model.py:472,422-423) in its TPU-native form. Also exercises
the §5.8 collectives that are dead code in single-process runs:
multihost_utils.process_allgather (metric-state cat gather) and
sync_global_devices (barriers).

argv: <process_id> <coordinator_port>
Prints per-step objectives and the gathered ATE so the parent can compare
with a single-process run of the same data.
"""
import os
import sys


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vitslam_tpu.parallel import sync_global_devices
    from tests.train_step_case import (
        build_case, run_steps, B, GATHER_ROWS,
    )

    devs = np.array(jax.devices())
    assert devs.size == 4 and jax.process_count() == 2
    mesh = Mesh(devs, ("data",))
    sharding = NamedSharding(mesh, P("data"))

    sync_global_devices("workers-up")

    def globalize(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == B:
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx])
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))

    objectives, state = run_steps(
        build_case(), globalize, mesh,
        barrier=lambda: sync_global_devices("step-compiled"),
    )
    for i, obj in enumerate(objectives):
        print(f"worker {pid}: step {i} objective {obj:.6f}", flush=True)

    # §5.8 metric-state gather: each process contributes its own rows; the
    # gathered state must be identical on both processes
    local_rows = np.arange(GATHER_ROWS, dtype=np.float32) + 100.0 * pid
    gathered = np.asarray(
        multihost_utils.process_allgather(local_rows)).reshape(-1)
    print(f"worker {pid}: gathered {gathered.tolist()}", flush=True)

    sync_global_devices("workers-done")
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()

"""REAL 2-process training step (VERDICT r2 Next #4): spawns two
jax.distributed CPU processes (2 local devices each), runs the full jitted
train step over a process-spanning 4-device 'data' mesh, exercises the
§5.8 collectives (process_allgather metric gather + sync_global_devices
barriers), and asserts the distributed objective matches a single-process
run of the identical case. The reference's equivalent is Lightning
multi-node DDP (training/run_model.py:472)."""
import os
import os.path as osp
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    worker = osp.join(osp.dirname(osp.abspath(__file__)),
                      "multiprocess_train_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-6000:]}"
        assert f"worker {i}: OK" in out

    # both processes saw identical (replicated) objectives
    def objectives(out):
        return [float(m) for m in re.findall(r"objective ([-\d.]+)", out)]

    obj0, obj1 = objectives(outs[0]), objectives(outs[1])
    assert len(obj0) == 2 and obj0 == obj1, (obj0, obj1)
    assert all(np.isfinite(o) for o in obj0)

    # the gathered metric state contains both processes' rows, in rank order
    from tests.train_step_case import GATHER_ROWS

    for out in outs:
        m = re.search(r"gathered \[([^\]]+)\]", out)
        got = [float(x) for x in m.group(1).split(",")]
        want = ([float(i) for i in range(GATHER_ROWS)]
                + [100.0 + i for i in range(GATHER_ROWS)])
        assert got == want, got

    # single-process ground truth on the same deterministic case
    from tests.train_step_case import build_case, run_steps
    from vitslam_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=4, n_model=1)
    from vitslam_tpu.parallel import shard_batch
    import jax

    def globalize(x):
        import jax.numpy as jnp
        return jnp.asarray(x)

    ref_obj, _ = run_steps(build_case(), globalize, mesh)
    np.testing.assert_allclose(obj0, ref_obj, rtol=2e-4, atol=2e-5)

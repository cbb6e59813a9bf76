"""Device mesh + sharding setup.

The reference's only parallelism is DDP data parallelism over NCCL
(SURVEY.md §2.10, training/run_model.py:472). TPU-native equivalent: a
device mesh with a ``data`` axis (and an optional ``model`` axis for tensor
sharding of the 1B backbone on small-HBM slices); batches are sharded over
``data``, params replicated (or sharded over ``model``), and XLA inserts
the gradient all-reduce over ICI when the jitted train step consumes a
sharded batch with replicated params — no hand-written collectives.

Multi-host: call jax.distributed.initialize() before any jax use (CLI does
this when run with --num_nodes > 1); process_index()==0 replaces the
reference's rank-0 checks.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (
        f"mesh {n_data}x{n_model} needs more than the {n} available devices"
    )
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put every array in the batch with its leading axis sharded
    over the 'data' mesh axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def model_partition_spec(x, n_model: int) -> P:
    """PartitionSpec for one parameter leaf under model-axis tensor
    parallelism: 2-D ``(in, out)`` kernels AND nn.scan-stacked 3-D
    ``(L, in, out)`` backbone kernels (models/aggregator.py) split their
    out (last) dim; everything else replicates."""
    if (getattr(x, "ndim", 0) in (2, 3) and x.shape[-1] % n_model == 0
            and x.shape[-1] >= 2 * n_model):
        return P(*([None] * (x.ndim - 1) + ["model"]))
    return P()


def shard_params_model(tree, mesh: Mesh):
    """Shard parameter tensors over the ``model`` mesh axis (tensor
    parallelism) per ``model_partition_spec``. XLA inserts the gathers/
    reductions inside the jitted step. Works on any pytree whose leaves
    mirror param shapes (TrainState including optimizer moments)."""
    n_model = mesh.shape["model"]
    if n_model == 1:
        return tree

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, model_partition_spec(x, n_model))),
        tree)


def sync_global_devices(name: str = "barrier"):
    """Cross-process barrier (the reference's trainer.strategy.barrier,
    training_metrics.py:90,101)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)

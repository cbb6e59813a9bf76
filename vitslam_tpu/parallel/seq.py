"""Sequence parallelism for the large-chunk backbone encode.

The reference's point/pose baselines run 75-frame chunks whose global
attention spans S*P ~ 31k-103k tokens (test_pointAlignedWrappedVGGT
_vkitti.yaml:13-15) — the SURVEY §5.7 extension point. TPU-native design:

  * the chunk's FRAME axis S is sharded over a named mesh axis. Patch
    embedding, frame attention, MLPs/projections and DPT decode are all
    frame-local -> zero communication;
  * each global-attention layer all-gathers the PREPPED (LN+RoPE'd) K/V
    over ICI and computes exact attention for its local queries
    (nn/layers.py::Attention(seq_axis=...)); per layer that is 2 x
    (B, S*P, C) bf16 gathers — a few ms on ICI vs tens of ms of
    attention math, so the axis scales the dominant O(S^2 P^2 C) term
    nearly linearly;
  * the camera head attends ACROSS frames: it gathers its S camera
    tokens (tiny), runs replicated, and returns the local slice
    (models/vggt_core.py::decode_camera).

Numerics are exactly the single-device encode (same kernels, same
reduction orders modulo the gather) — asserted by
tests/test_parallel_pipeline.py on an 8-virtual-device CPU mesh.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P


def sequence_parallel_encode(model, params, images: jax.Array, mesh: Mesh,
                             axis: str = "model"):
    """Run ``model.encode_chunks`` with the chunk frame axis sharded.

    ``model`` must be constructed with ``seq_axis=axis`` (point/pose
    variants and VGGTCore expose the field). ``images`` is (B, S, 3, H, W)
    with S divisible by the mesh axis size. Returns the raw-outputs dict
    with every (B, S, ...) leaf sharded over ``axis`` on dim 1.
    """
    n = mesh.shape[axis]
    S = images.shape[1]
    if S % n != 0:
        raise ValueError(
            f"sequence-parallel encode needs S % mesh.shape[{axis!r}] == 0 "
            f"(got S={S}, axis size {n}); pad the chunk to a multiple"
        )
    fn = jax.shard_map(
        lambda p, im: model.apply(p, im, method=model.encode_chunks),
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(params, images)

"""The jitted data-parallel training step.

Replaces Lightning's DDP training_step (training/run_model.py:232-340): the
whole chunk loop — backbone, alignment head, output decode, merge, GT
alignment, multi-task loss — traces into ONE XLA graph per
(chunk count, width, overlap) bucket. Gradients are taken only w.r.t. the
trainable parameter partition, so XLA dead-code-eliminates the frozen
backbone's backward pass (the reference relies on requires_grad=False for
the same effect). With the batch sharded over the mesh 'data' axis and
params replicated, XLA inserts the gradient all-reduce over ICI
automatically (the DDP all-reduce equivalent).
"""
from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..geometry import pad_to_4x4
from ..slam.chunking import CHUNK_AXIS_KEYS, FRAME_AXIS_KEYS
from ..slam.gt_alignment import align_outputs
from .optim import merge_params


@flax.struct.dataclass
class TrainState:
    trainable: Any
    frozen: Any
    opt_state: Any
    step: jax.Array

    @property
    def params(self):
        return {"params": merge_params(self.trainable, self.frozen)}


def merge_outputs_traced(outs: Sequence[dict], overlap: int = 0) -> dict:
    """jnp version of slam.chunking.merge_chunk_outputs for use inside the
    traced train step (training merges with overlap=0 — duplicated overlap
    frames stay in both predictions and GT, run_model.py:338)."""
    merged: dict = {}
    for key in outs[0]:
        vals = [o[key] for o in outs if key in o and o[key] is not None]
        if not vals:
            continue
        if key in CHUNK_AXIS_KEYS:
            merged[key] = jnp.concatenate(vals, axis=1)
        elif key in FRAME_AXIS_KEYS:
            if overlap > 0:
                vals = [vals[0]] + [v[:, overlap:] for v in vals[1:]]
            merged[key] = jnp.concatenate(vals, axis=1)
        else:
            merged[key] = vals[-1]
    return merged


def make_train_step(
    model,
    loss_fn,
    tx: optax.GradientTransformation,
    num_overlap: int,
    gt_alignment_type: str = "scale_from_depths",
    use_gt_poses: bool = False,
    donate: bool = True,
):
    """Build the jitted train step.

    The returned function signature:
        step_fn(state, chunk_batches: tuple[dict], merged_batch: dict,
                rng) -> (state, metrics dict)
    where chunk_batches are the pre-sliced per-chunk GT dicts (images +
    GT keys) and merged_batch is their overlap-0 concatenation.
    """

    def loss_of(trainable, frozen, chunk_batches, merged_batch, rng, step):
        params = {"params": merge_params(trainable, frozen)}
        state = None
        outs = []
        for i, chunk in enumerate(chunk_batches):
            rng_i = jax.random.fold_in(rng, i)
            gt_poses = None
            if use_gt_poses and "extrinsics" in chunk:
                gt_poses = pad_to_4x4(
                    jnp.asarray(chunk["extrinsics"], jnp.float32)
                )
            o, state = model.apply(
                params, chunk["images"], num_overlap, state, gt_poses, True,
                rngs={"dropout": rng_i},
            )
            outs.append(o)
        preds = merge_outputs_traced(outs, overlap=0)
        image_hw = tuple(merged_batch["images"].shape[-2:])
        preds = align_outputs(preds, merged_batch, gt_alignment_type,
                              image_size_hw=image_hw)
        losses = loss_fn(
            preds, merged_batch, step, jax.random.fold_in(rng, 0x7FFFFFFF)
        )
        return losses["objective"], losses

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_fn(state: TrainState, chunk_batches, merged_batch, rng):
        (obj, losses), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.trainable, state.frozen, chunk_batches, merged_batch, rng,
            state.step,
        )
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(
            trainable=trainable, frozen=state.frozen, opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = {k: v for k, v in losses.items()
                   if isinstance(v, jax.Array) and v.ndim == 0}
        metrics["grad_norm"] = grad_norm
        return new_state, metrics

    return step_fn


def make_eval_step(model, loss_fn, num_overlap: int,
                   gt_alignment_type: str = "scale_from_depths"):
    """Jitted no-grad validation step mirroring the train chunk loop."""

    def loss_of(params, chunk_batches, merged_batch, step):
        state = None
        outs = []
        for chunk in chunk_batches:
            o, state = model.apply(params, chunk["images"], num_overlap,
                                   state, None, False)
            outs.append(o)
        preds = merge_outputs_traced(outs, overlap=0)
        image_hw = tuple(merged_batch["images"].shape[-2:])
        preds = align_outputs(preds, merged_batch, gt_alignment_type,
                              image_size_hw=image_hw)
        return loss_fn(preds, merged_batch, step, jax.random.PRNGKey(0)), preds

    return jax.jit(loss_of)

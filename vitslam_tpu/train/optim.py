"""Optimizer construction: AdamW + linear-warmup->cosine LR, grad clipping,
wildcard parameter freezing, gradient accumulation.

Reference parity: training/run_model.py:342-367 (AdamW, per-step
linear-warmup->cosine schedule), grad clip 1.0 (:472),
vggt freeze_modules wildcard freezing (:215-228), accumulate_grad_batches
(:472). TPU-native: optax transforms; freezing is an optax.masked zero-
update + the train step computes gradients only w.r.t. the trainable
partition so XLA dead-code-eliminates the frozen backward pass entirely.
"""
from __future__ import annotations

import fnmatch
from typing import Sequence

import jax.numpy as jnp
import optax
from flax import traverse_util


def warmup_cosine_schedule(max_lr: float, min_lr: float, total_steps: int,
                           warmup_percent: float = 0.05,
                           warmup_type: str = "linear") -> optax.Schedule:
    """Linear (or exp) warmup to max_lr then cosine decay to min_lr."""
    warmup_steps = max(1, int(total_steps * warmup_percent))
    if warmup_type == "linear":
        warmup = optax.linear_schedule(0.0, max_lr, warmup_steps)
    else:
        warmup = lambda s: max_lr * (jnp.minimum(s / warmup_steps, 1.0) ** 2)
    cosine = optax.cosine_decay_schedule(
        max_lr, max(1, total_steps - warmup_steps), alpha=min_lr / max_lr
    )
    return optax.join_schedules([warmup, cosine], [warmup_steps])


def match_any(path: str, patterns: Sequence[str]) -> bool:
    return any(fnmatch.fnmatch(path, p) for p in patterns)


def freeze_mask(params, freeze_patterns: Sequence[str]):
    """Pytree of bools: True = trainable, False = frozen. Paths are
    '/'-joined flax param paths matched with fnmatch wildcards
    (reference: freeze_modules(model, ["*aggregator*", ...]),
    run_model.py:221)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    mask = {k: not match_any(k, freeze_patterns) for k in flat}
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in mask.items()}
    )


def partition_params(params, freeze_patterns: Sequence[str]):
    """Split params into (trainable, frozen) trees with the same structure
    (missing leaves pruned). Used so jax.grad targets only the trainable
    partition."""
    flat = traverse_util.flatten_dict(params, sep="/")
    train = {k: v for k, v in flat.items() if not match_any(k, freeze_patterns)}
    frozen = {k: v for k, v in flat.items() if match_any(k, freeze_patterns)}
    unf = lambda d: traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in d.items()}
    )
    return unf(train), unf(frozen)


def merge_params(trainable, frozen):
    a = traverse_util.flatten_dict(trainable, sep="/")
    b = traverse_util.flatten_dict(frozen, sep="/")
    merged = {**b, **a}
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in merged.items()}
    )


def build_optimizer(
    max_lr: float = 5e-5,
    min_lr: float = 1e-8,
    total_steps: int = 70000,
    warmup_percent: float = 0.05,
    weight_decay: float = 0.05,
    grad_clip_norm: float = 1.0,
    accum_steps: int = 1,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    schedule = warmup_cosine_schedule(max_lr, min_lr, total_steps, warmup_percent)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adamw(schedule, weight_decay=weight_decay,
                    b1=0.9, b2=0.999, eps=1e-8),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx, schedule

"""Numerical-sanity instrumentation (SURVEY.md §5.2).

The reference's only sanitizers are NaN/Inf scrubbing
(check_and_fix_inf_nan) and inline shape asserts; this framework adds an
opt-in device-side NaN detector: ``nan_check(tree, name)`` inserts a
``jax.debug.callback`` that logs (or raises) when any leaf contains
NaN/Inf. Zero-cost when disabled (the call is a no-op unless
VITSLAM_DEBUG_NANS=1 or ``enable_nan_checks(True)``).

Tests can additionally run under jax.config.update("jax_debug_nans", True).
"""
from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp

_ENABLED = os.environ.get("VITSLAM_DEBUG_NANS", "0") == "1"
_RAISE = os.environ.get("VITSLAM_DEBUG_NANS_RAISE", "0") == "1"
logger = logging.getLogger(__name__)


def enable_nan_checks(enabled: bool = True, raise_on_nan: bool = False):
    global _ENABLED, _RAISE
    _ENABLED = enabled
    _RAISE = raise_on_nan


def nan_checks_enabled() -> bool:
    return _ENABLED


def _report(name: str, bad_count):
    bad = int(bad_count)
    if bad:
        msg = f"NaN/Inf detected in {name}: {bad} bad elements"
        if _RAISE:
            raise FloatingPointError(msg)
        logger.warning(msg)


def nan_check(tree, name: str = "tensor"):
    """Insert a device-side NaN/Inf check on every leaf of ``tree``.
    Returns ``tree`` unchanged (so it can be used inline in jitted code)."""
    if not _ENABLED:
        return tree

    leaves, _ = jax.tree_util.tree_flatten(tree)
    for i, leaf in enumerate(leaves):
        if not isinstance(leaf, jax.Array) and not hasattr(leaf, "dtype"):
            continue
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            continue
        bad = jnp.sum(~jnp.isfinite(leaf))
        jax.debug.callback(_report, f"{name}[{i}]", bad)
    return tree

"""Minimal Hydra-semantics config system: YAML defaults-list inheritance,
``${dotted.path}`` interpolation, and recursive ``_target_`` instantiation.

Reference parity: the reference composes configs with hydra
initialize/compose + instantiate (training/run_model.py:432-433,
:139-148,193-211) and uses exactly these three features (SURVEY.md §5.6):
defaults list with ``_self_`` (train_...yaml:1-3), ``${}`` interpolation
(test_...yaml:55-59), recursive ``_target_`` DI for datasets/loss/metrics/
model. The config *is* the experiment.
"""
from __future__ import annotations

import importlib
import os.path as osp
import re
from typing import Any

import yaml

_INTERP = re.compile(r"^\$\{([^}]+)\}$")
_INTERP_PART = re.compile(r"\$\{([^}]+)\}")


class DotDict(dict):
    """dict with attribute access, recursive."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return DotDict({k: DotDict.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [DotDict.wrap(v) for v in obj]
        return obj


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _resolve_path(root: dict, dotted: str):
    node: Any = root
    for part in dotted.split("."):
        node = node[part]
    return node


def _interpolate(node, root):
    if isinstance(node, str):
        m = _INTERP.match(node)
        if m:  # whole-value interpolation preserves type
            return _interpolate(_resolve_path(root, m.group(1)), root)
        return _INTERP_PART.sub(
            lambda mm: str(_resolve_path(root, mm.group(1))), node
        )
    if isinstance(node, dict):
        return {k: _interpolate(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(v, root) for v in node]
    return node


def set_dotted(cfg, dotted: str, value):
    """Set ``a.b.0.c``-style paths (integers index into lists). Values are
    parsed as YAML when given as strings (hydra override semantics)."""
    keys = dotted.split(".")
    node: Any = cfg
    for k in keys[:-1]:
        node = node[int(k)] if isinstance(node, list) else node[k]
    last = keys[-1]
    if isinstance(value, str):
        value = yaml.safe_load(value)
    if isinstance(node, list):
        node[int(last)] = value
    else:
        node[last] = value


def compose(config_name: str, config_dir: str = "configs",
            overrides=None) -> DotDict:
    """Load <config_dir>/<config_name>.yaml honoring its defaults list,
    apply dotted overrides, then resolve interpolations. Overrides land
    BEFORE interpolation (hydra semantics: training/run_model.py:432-433),
    so ``img_size=140`` propagates into every ``${img_size}`` consumer.
    ``overrides``: dict of dotted-path -> value, or list of "k=v" strings."""
    path = osp.join(config_dir, config_name)
    if not path.endswith(".yaml"):
        path += ".yaml"
    raw = load_yaml(path)
    defaults = raw.pop("defaults", None)
    merged: dict = {}
    if defaults:
        self_seen = False
        for item in defaults:
            if item == "_self_":
                merged = _deep_merge(merged, raw)
                self_seen = True
            else:
                name = item if isinstance(item, str) else list(item.values())[0]
                sub = compose(name, config_dir)
                merged = _deep_merge(merged, sub)
        if not self_seen:
            merged = _deep_merge(merged, raw)
    else:
        merged = raw
    if overrides:
        if isinstance(overrides, dict):
            items = list(overrides.items())
        else:
            items = []
            for ov in overrides:
                key, sep, val = ov.partition("=")
                if not sep:
                    raise ValueError(
                        f"malformed override {ov!r}: expected 'key=value'")
                items.append((key, val))
        for key, val in items:
            set_dotted(merged, key, val)
    merged = _interpolate(merged, merged)
    return DotDict.wrap(merged)


def _import_target(target: str):
    module, _, attr = target.rpartition(".")
    return getattr(importlib.import_module(module), attr)


def instantiate(node, **overrides):
    """Recursively instantiate a ``_target_`` config node. Nested dicts/
    lists with their own ``_target_`` become objects; plain dicts stay
    dicts. ``_partial_: true`` returns a functools.partial."""
    import functools

    if isinstance(node, list):
        return [instantiate(v) for v in node]
    if not isinstance(node, dict):
        return node
    if "_target_" not in node:
        return {k: instantiate(v) for k, v in node.items()}
    node = dict(node)
    target = _import_target(node.pop("_target_"))
    partial = node.pop("_partial_", False)
    kwargs = {k: instantiate(v) for k, v in node.items()}
    kwargs.update(overrides)
    if partial:
        return functools.partial(target, **kwargs)
    return target(**kwargs)

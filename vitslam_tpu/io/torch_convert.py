"""Torch <-> flax parameter bridge: the VGGT-1B weight-converter machinery
(SURVEY.md §5.4: "a torch->JAX weight converter for VGGT-1B is a required
deliverable").

Handles the two structural differences between a torch state dict and this
framework's params:
  * **Linear/Conv transposes**: torch Linear keeps (out, in); flax Dense
    keeps (in, out). torch Conv2d keeps (out, in, kh, kw); flax Conv keeps
    (kh, kw, in, out).
  * **scan stacking**: the Aggregator/PatchEmbed layers are lax.scan'd with
    params stacked on a leading depth axis; a torch checkpoint stores one
    entry per layer (``...blocks.N....``) which the importer stacks (and the
    exporter unstacks).

``import_torch_style`` consumes a flat ``name -> ndarray`` dict using THIS
framework's naming with torch layout + per-layer indices; a thin
``key_map`` hook translates actual VGGT checkpoint names into that naming,
so adapting to the real facebook/VGGT-1B state dict is a pure name-mapping
exercise (no weights are downloadable in this environment to verify
against).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
from flax import serialization, traverse_util


def _is_scan_stacked(path: tuple, leaf: np.ndarray) -> bool:
    # scanned collections live under .../layers/... or .../blocks/...
    return any(p in ("layers", "blocks") for p in path)


def _to_torch_layout(path: tuple, x: np.ndarray) -> np.ndarray:
    name = path[-1]
    if name == "kernel":
        if x.ndim == 2:
            return x.T
        if x.ndim == 4:  # (kh, kw, in, out) -> (out, in, kh, kw)
            return np.transpose(x, (3, 2, 0, 1))
    return x


def _from_torch_layout(path: tuple, x: np.ndarray, target_shape) -> np.ndarray:
    # unconditional: the torch-style contract always stores torch layout
    # (a shape check would silently skip square matrices)
    name = path[-1]
    if name == "kernel":
        if x.ndim == 2:
            return x.T
        if x.ndim == 4:
            return np.transpose(x, (2, 3, 1, 0))
    return x


def export_torch_style(params) -> dict:
    """Flatten flax params to a torch-style flat dict: scan-stacked layers
    become per-layer ``<prefix>.<i>.<rest>`` entries, kernels transposed to
    torch layout, '.'-joined names."""
    flat = traverse_util.flatten_dict(serialization.to_state_dict(params))
    out = {}
    for path, leaf in flat.items():
        leaf = np.asarray(leaf)
        if _is_scan_stacked(path, leaf) and leaf.ndim >= 1:
            scan_pos = max(
                i for i, p in enumerate(path) if p in ("layers", "blocks")
            )
            for i in range(leaf.shape[0]):
                key_path = path[: scan_pos + 1] + (str(i),) + path[scan_pos + 1:]
                out[".".join(key_path)] = _to_torch_layout(path, leaf[i])
        else:
            out[".".join(path)] = _to_torch_layout(path, leaf)
    return out


def import_torch_style(
    state_dict: dict,
    params_template,
    key_map: Optional[Callable[[str], Optional[str]]] = None,
    strict: bool = True,
):
    """Inverse of export_torch_style: restack scanned layers, fix layouts.

    Args:
        state_dict: flat torch-style name -> array.
        params_template: flax params pytree giving structure/shapes.
        key_map: optional translator from source checkpoint names to this
            framework's torch-style names (return None to drop a key).
    """
    if key_map is not None:
        mapped = {}
        for k, v in state_dict.items():
            nk = key_map(k)
            if nk is not None:
                mapped[nk] = v
        state_dict = mapped

    tmpl_flat = traverse_util.flatten_dict(
        serialization.to_state_dict(params_template)
    )
    resolved = {}
    missing = []
    for path, tleaf in tmpl_flat.items():
        tleaf = np.asarray(tleaf)
        if _is_scan_stacked(path, tleaf):
            scan_pos = max(
                i for i, p in enumerate(path) if p in ("layers", "blocks")
            )
            depth = tleaf.shape[0]
            per_layer = []
            ok = True
            for i in range(depth):
                key = ".".join(path[: scan_pos + 1] + (str(i),) + path[scan_pos + 1:])
                if key not in state_dict:
                    ok = False
                    break
                per_layer.append(
                    _from_torch_layout(path, np.asarray(state_dict[key]),
                                       tleaf.shape[1:])
                )
            if ok:
                resolved[path] = np.stack(per_layer).astype(tleaf.dtype)
                continue
        key = ".".join(path)
        if key in state_dict:
            resolved[path] = _from_torch_layout(
                path, np.asarray(state_dict[key]), tleaf.shape
            ).astype(tleaf.dtype)
        else:
            missing.append(key)
            resolved[path] = tleaf
    if missing and strict:
        raise KeyError(f"missing {len(missing)} keys, e.g. {missing[:5]}")
    state = traverse_util.unflatten_dict(resolved)
    return serialization.from_state_dict(params_template, state), missing

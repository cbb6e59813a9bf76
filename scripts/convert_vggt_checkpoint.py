#!/usr/bin/env python
"""Convert a facebook/VGGT-1B (or FeatureAlignedVGGT) torch checkpoint into
this framework's parameter format (SURVEY.md §5.4: required deliverable).

Usage:
    python scripts/convert_vggt_checkpoint.py \
        --torch-ckpt model.safetensors|model.pt \
        --out vggt1b_vitslam.ckpt \
        [--model feature_aligned|point_aligned|pose_aligned]

Pipeline: load the torch state dict (safetensors or torch.load on CPU),
translate key names via VGGT_KEY_RULES into this framework's torch-style
naming, then `io.torch_convert.import_torch_style` handles layout transposes
(torch Linear (out,in) -> flax (in,out); Conv OIHW -> HWIO) and stacks
per-layer weights for the scanned Aggregator/PatchEmbed.

NOTE: this environment has no network access and no VGGT checkpoint to
verify against; VGGT_KEY_RULES encodes the public VGGT-1B module naming
(aggregator.frame_blocks.N.*, aggregator.global_blocks.N.*, DINOv2 patch
embed blocks, camera/depth/point heads). Unmatched source keys are listed
so the mapping can be completed against a real state dict in one pass.
"""
from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

# (source regex, replacement) applied in order; first match wins.
# Target naming = this framework's torch-style export naming
# (io.torch_convert.export_torch_style of the flax params).
VGGT_KEY_RULES: list[tuple[str, str]] = [
    # DINOv2 patch embedding inside the aggregator
    (r"^aggregator\.patch_embed\.patch_embed\.proj\.(.*)$",
     r"params.core.aggregator.patch_embed.proj.\1"),
    (r"^aggregator\.patch_embed\.pos_embed$",
     r"params.core.aggregator.patch_embed.pos_embed"),
    (r"^aggregator\.patch_embed\.blocks\.(\d+)\.(.*)$",
     r"params.core.aggregator.patch_embed.blocks.\1.block.\2"),
    (r"^aggregator\.patch_embed\.norm\.(.*)$",
     r"params.core.aggregator.patch_embed.norm.\1"),
    # alternating attention blocks (scanned 'layers' stack)
    (r"^aggregator\.frame_blocks\.(\d+)\.(.*)$",
     r"params.core.aggregator.layers.\1.frame_block.\2"),
    (r"^aggregator\.global_blocks\.(\d+)\.(.*)$",
     r"params.core.aggregator.layers.\1.global_block.\2"),
    # camera/register tokens
    (r"^aggregator\.camera_token$", r"params.core.aggregator.camera_token"),
    (r"^aggregator\.register_token$", r"params.core.aggregator.register_token"),
    # heads
    (r"^camera_head\.(.*)$", r"params.core.camera_head.\1"),
    (r"^depth_head\.(.*)$", r"params.core.depth_head.\1"),
    (r"^point_head\.(.*)$", r"params.core.point_head.\1"),
    (r"^track_head\.(.*)$", r"params.core.track_head.\1"),
    (r"^alignment_head\.(.*)$", r"params.alignment_head.\1"),
]

# torch leaf-name -> flax leaf-name
LEAF_RENAMES = {
    "weight": "kernel",
    "bias": "bias",
    "gamma": "gamma",
}


def translate_key(key: str) -> str | None:
    key = key.removeprefix("model.")
    for pat, repl in VGGT_KEY_RULES:
        m = re.match(pat, key)
        if m:
            out = re.sub(pat, repl, key)
            head, _, leaf = out.rpartition(".")
            # LayerNorm weight -> scale; Linear/Conv weight -> kernel
            if leaf == "weight":
                leaf = "scale" if re.search(r"norm", head.split(".")[-1]) else "kernel"
            else:
                leaf = LEAF_RENAMES.get(leaf, leaf)
            return f"{head}.{leaf}"
    return None


def load_torch_state_dict(path: str) -> dict:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="feature_aligned",
                    choices=["feature_aligned", "point_aligned", "pose_aligned"])
    ap.add_argument("--strict", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from vitslam_tpu.io.checkpoint import save_checkpoint
    from vitslam_tpu.io.torch_convert import import_torch_style
    from vitslam_tpu.models.presets import (
        flagship, flagship_point_aligned, flagship_pose_aligned,
    )

    model = {
        "feature_aligned": flagship,
        "point_aligned": flagship_point_aligned,
        "pose_aligned": flagship_pose_aligned,
    }[args.model]()
    sample = jnp.zeros((1, 2, 3, 518, 518), jnp.bfloat16)
    template = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), sample, 1
    )

    sd = load_torch_state_dict(args.torch_ckpt)
    mapped, dropped = {}, []
    for k, v in sd.items():
        nk = translate_key(k)
        if nk is None:
            dropped.append(k)
        else:
            mapped[nk] = np.asarray(v)
    if dropped:
        print(f"unmatched source keys ({len(dropped)}), e.g.:")
        for k in dropped[:20]:
            print("  ", k)

    params, missing = import_torch_style(mapped, template, strict=args.strict)
    if missing:
        print(f"template keys left at init ({len(missing)}), e.g.:")
        for k in missing[:20]:
            print("  ", k)
    save_checkpoint(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

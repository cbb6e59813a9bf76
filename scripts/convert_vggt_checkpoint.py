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

# (source regex, replacement) applied in order; first match wins; a None
# replacement drops the key (buffers our models don't keep).
# Target naming = this framework's torch-style export naming
# (io.torch_convert.export_torch_style of the flax params).
_DPT_RULES: list[tuple[str, str | None]] = [
    # VGGT DPTHead internals (vggt/heads/dpt_head.py naming)
    (r"projects\.(\d)\.(.*)$", r"project_\1.\2"),
    (r"resize_layers\.(\d)\.(.*)$", r"resize_layer_\1.\2"),
    (r"scratch\.layer(\d)_rn\.(.*)$", None),  # placeholder; index shifts below
    (r"scratch\.refinenet(\d)\.resConfUnit1\.(.*)$", None),
    (r"scratch\.refinenet(\d)\.resConfUnit2\.(.*)$", None),
    (r"scratch\.refinenet(\d)\.out_conv\.(.*)$", None),
    (r"scratch\.output_conv1\.(.*)$", r"head_conv1.\1"),
    (r"scratch\.output_conv2\.0\.(.*)$", r"head_conv2.\1"),
    (r"scratch\.output_conv2\.2\.(.*)$", r"head_out.\1"),
]


def _translate_dpt(rest: str) -> str | None:
    """VGGT DPTHead sub-key -> our DPTHead naming. The 1-based layerK_rn /
    refinenetK indices become 0-based (refinenet4 fuses the deepest tap =
    our fusion_3)."""
    m = re.match(r"^scratch\.layer(\d)_rn\.(.*)$", rest)
    if m:
        return f"scratch_{int(m.group(1)) - 1}.{m.group(2)}"
    m = re.match(r"^scratch\.refinenet(\d)\.resConfUnit([12])\.(.*)$", rest)
    if m:
        if (m.group(1), m.group(2)) == ("4", "1"):
            # refinenet4 fuses the deepest tap alone (no skip input), so its
            # resConfUnit1 params exist in the checkpoint but are dead — drop
            return None
        return f"fusion_{int(m.group(1)) - 1}.rcu{m.group(2)}.{m.group(3)}"
    m = re.match(r"^scratch\.refinenet(\d)\.out_conv\.(.*)$", rest)
    if m:
        return f"fusion_{int(m.group(1)) - 1}.out_conv.{m.group(2)}"
    for pat, repl in _DPT_RULES:
        if repl is not None and re.match(pat, rest):
            return re.sub(pat, repl, rest)
    return None


VGGT_KEY_RULES: list[tuple[str, str | None]] = [
    # DINOv2 patch embedding inside the aggregator
    (r"^aggregator\.patch_embed\.patch_embed\.proj\.(.*)$",
     r"params.core.aggregator.patch_embed.proj.\1"),
    (r"^aggregator\.patch_embed\.(pos_embed|cls_token|register_tokens)$",
     r"params.core.aggregator.patch_embed.\1"),
    (r"^aggregator\.patch_embed\.mask_token$", None),  # masked-training only
    (r"^aggregator\.patch_embed\.blocks\.(\d+)\.(.*)$",
     r"params.core.aggregator.patch_embed.blocks.\1.block.\2"),
    (r"^aggregator\.patch_embed\.norm\.(.*)$",
     r"params.core.aggregator.patch_embed.norm.\1"),
    # alternating attention blocks (scanned 'layers' stack)
    (r"^aggregator\.frame_blocks\.(\d+)\.(.*)$",
     r"params.core.aggregator.layers.\1.frame_block.\2"),
    (r"^aggregator\.global_blocks\.(\d+)\.(.*)$",
     r"params.core.aggregator.layers.\1.global_block.\2"),
    # camera/register tokens (values: leading singleton squeezed)
    (r"^aggregator\.camera_token$", r"params.core.aggregator.camera_token"),
    (r"^aggregator\.register_token$", r"params.core.aggregator.register_token"),
    # camera head (VGGT CameraHead naming -> ours)
    (r"^camera_head\.trunk\.(\d+)\.(.*)$",
     r"params.core.camera_head.trunk_\1.\2"),
    (r"^camera_head\.poseLN_modulation\.1\.(.*)$",
     r"params.core.camera_head.modulation.\1"),
    (r"^camera_head\.(.*)$", r"params.core.camera_head.\1"),
    # track head (vggt/heads/track_head.py + track_modules/*): torch
    # Sequential/ModuleList indices flatten to our _N module names; the
    # DPT feature_extractor is handled in translate_key (same rules as
    # depth/point heads). Disabled in every reference config, but the
    # VGGT-1B checkpoint ships trained track weights — map them all.
    (r"^track_head\.tracker\.updateformer\.(time_blocks|space_virtual_blocks"
     r"|space_point2virtual_blocks|space_virtual2point_blocks)\.(\d+)\.(.*)$",
     r"params.core.track_head.tracker.updateformer.\1_\2.\3"),
    (r"^track_head\.tracker\.(ffeat_updater|vis_predictor|conf_predictor)"
     r"\.0\.(.*)$",
     r"params.core.track_head.tracker.\1_0.\2"),
    (r"^track_head\.tracker\.(.*)$", r"params.core.track_head.tracker.\1"),
    (r"^alignment_head\.(.*)$", r"params.alignment_head.\1"),
]

# VGGT checkpoint layout fixes applied to VALUES at translate time:
#   * aggregator camera/register tokens are stored (1, 2, K, C); ours are
#     (2, K, C) — squeeze the leading singleton;
#   * DPT resize_layers.0/1 are ConvTranspose2d: torch stores IOHW (the
#     generic conv rule expects OIHW) — swap in/out first.
VALUE_TRANSFORMS: list[tuple[str, "object"]] = [
    (r"^aggregator\.(camera_token|register_token)$", lambda v: v[0]),
    (r"^(depth_head|point_head)\.resize_layers\.[01]\.weight$",
     lambda v: v.transpose(1, 0, 2, 3)),
]


def transform_value(key: str, v):
    for pat, fn in VALUE_TRANSFORMS:
        if re.match(pat, key):
            return fn(v)
    return v

# torch leaf-name -> flax leaf-name
LEAF_RENAMES = {
    "weight": "kernel",
    "bias": "bias",
    "gamma": "gamma",
}


def translate_key(key: str) -> str | None:
    key = key.removeprefix("model.")
    out = None
    m = re.match(r"^(depth_head|point_head|track_head\.feature_extractor)\.(.*)$",
                 key)
    if m:
        rest = _translate_dpt(m.group(2))
        if rest is None:
            return None
        out = f"params.core.{m.group(1)}.{rest}"
    else:
        for pat, repl in VGGT_KEY_RULES:
            if re.match(pat, key):
                if repl is None:
                    return None
                out = re.sub(pat, repl, key)
                break
    if out is None:
        return None
    head, _, leaf = out.rpartition(".")
    # LayerNorm weight -> scale; Linear/Conv weight -> kernel
    if leaf == "weight":
        leaf = "scale" if re.search(r"norm", head.split(".")[-1]) else "kernel"
    else:
        leaf = LEAF_RENAMES.get(leaf, leaf)
    return f"{head}.{leaf}"


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
    ap.add_argument("--no-track", action="store_true",
                    help="skip the track_head weights (smaller output)")
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
    if not args.no_track:
        # graft a full-size TrackHead param tree under params.core so the
        # checkpoint's track_head.* keys have template slots: the reference
        # instantiates VGGT's TrackHead in every model even though every
        # shipped config disables it (featureAligned_vggt.py:30), and
        # VGGT-1B ships trained track weights — conversion must be lossless.
        # Track param shapes are resolution-independent, so a small spatial
        # grid suffices for init (corr pyramid needs fmap >= 2^(levels-1)).
        from vitslam_tpu.models import TrackHead

        th = TrackHead(dim_in=2 * 1024)
        gh = gw = 10
        taps = [jnp.zeros((1, 1, 5 + gh * gw, 2048), jnp.bfloat16)] * 4
        timgs = jnp.zeros((1, 1, 3, gh * 14, gw * 14), jnp.bfloat16)
        tparams = th.init(jax.random.PRNGKey(0), taps, timgs, 5,
                          jnp.zeros((1, 1, 2), jnp.float32))
        template["params"]["core"]["track_head"] = tparams["params"]

    sd = load_torch_state_dict(args.torch_ckpt)
    mapped, dropped = {}, []
    for k, v in sd.items():
        nk = translate_key(k)
        if nk is None:
            dropped.append(k)
        else:
            mapped[nk] = transform_value(k, np.asarray(v))
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

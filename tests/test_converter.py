"""Checkpoint-converter roundtrip: our params -> synthetic VGGT-style torch
state dict (inverse key rules + torch layouts) -> converter translate +
import -> identical params. Validates the key rules and scan restacking."""
import re
import sys
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "scripts"))

from convert_vggt_checkpoint import translate_key  # noqa: E402
from vitslam_tpu.io.torch_convert import export_torch_style, import_torch_style  # noqa: E402
from vitslam_tpu.models import FeatureAlignedVGGT  # noqa: E402
from vitslam_tpu.utils.testing import tiny_model_kwargs  # noqa: E402

# inverse of the converter's VGGT_KEY_RULES (our torch-style name -> VGGT name)
INVERSE_RULES = [
    (r"^params\.core\.aggregator\.patch_embed\.proj\.(.*)$",
     r"aggregator.patch_embed.patch_embed.proj.\1"),
    (r"^params\.core\.aggregator\.patch_embed\.pos_embed$",
     r"aggregator.patch_embed.pos_embed"),
    (r"^params\.core\.aggregator\.patch_embed\.blocks\.(\d+)\.block\.(.*)$",
     r"aggregator.patch_embed.blocks.\1.\2"),
    (r"^params\.core\.aggregator\.patch_embed\.norm\.(.*)$",
     r"aggregator.patch_embed.norm.\1"),
    (r"^params\.core\.aggregator\.layers\.(\d+)\.frame_block\.(.*)$",
     r"aggregator.frame_blocks.\1.\2"),
    (r"^params\.core\.aggregator\.layers\.(\d+)\.global_block\.(.*)$",
     r"aggregator.global_blocks.\1.\2"),
    (r"^params\.core\.aggregator\.camera_token$", r"aggregator.camera_token"),
    (r"^params\.core\.aggregator\.register_token$", r"aggregator.register_token"),
    (r"^params\.core\.camera_head\.(.*)$", r"camera_head.\1"),
    (r"^params\.core\.depth_head\.(.*)$", r"depth_head.\1"),
    (r"^params\.core\.point_head\.(.*)$", r"point_head.\1"),
    (r"^params\.alignment_head\.(.*)$", r"alignment_head.\1"),
]


def to_vggt_name(our_key: str) -> str:
    head, _, leaf = our_key.rpartition(".")
    if leaf == "kernel":
        leaf = "weight"
    elif leaf == "scale":
        leaf = "weight"
    key = f"{head}.{leaf}"
    for pat, repl in INVERSE_RULES:
        if re.match(pat, key):
            return re.sub(pat, repl, key)
    raise KeyError(our_key)


def test_converter_roundtrip():
    kw = tiny_model_kwargs(num_memory_tokens=4, align_embed_dim=32,
                           align_dec_dim=16)
    model = FeatureAlignedVGGT(**kw)
    imgs = jnp.zeros((1, 2, 3, 28, 42))
    params = model.init(jax.random.PRNGKey(0), imgs, 1)

    ours = export_torch_style(params)
    vggt_sd = {to_vggt_name(k): v for k, v in ours.items()}

    mapped = {}
    unmatched = []
    for k, v in vggt_sd.items():
        nk = translate_key(k)
        if nk is None:
            unmatched.append(k)
        else:
            mapped[nk] = np.asarray(v)
    assert not unmatched, unmatched[:10]

    restored, missing = import_torch_style(mapped, params, strict=False)
    assert not missing, missing[:10]
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

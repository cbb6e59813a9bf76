"""VGGT-1B checkpoint-converter validation (SURVEY.md §5.4 deliverable).

Three layers of evidence, none requiring the (un-downloadable) real weights:
  1. an INDEPENDENT enumeration of the public facebook/VGGT-1B state-dict
     key surface (expected_vggt_keys) must equal, key for key, what our
     model's param tree exports through the inverse rules — so the rule
     table is complete by construction and real weights can't surprise it;
  2. a synthetic real-layout state dict (torch layouts: IOHW ConvTranspose,
     (1, 2, K, C) tokens) roundtrips through translate+import back to the
     exact source params;
  3. torch itself is the oracle for the layout rules: a torch
     ConvTranspose2d(k=s) / Conv2d forward must match our StridedUpsample /
     nn.Conv after weight conversion.
"""
import re
import sys
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "scripts"))

from convert_vggt_checkpoint import translate_key, transform_value  # noqa: E402
from vitslam_tpu.io.torch_convert import export_torch_style, import_torch_style  # noqa: E402
from vitslam_tpu.models import FeatureAlignedVGGT  # noqa: E402
from vitslam_tpu.utils.testing import tiny_model_kwargs  # noqa: E402

pytestmark = pytest.mark.quick


# ---------------------------------------------------------------------------
# the public VGGT-1B key surface, enumerated independently of our code
# ---------------------------------------------------------------------------

def _block_keys(prefix, qk_norm=False, layerscale=True):
    ks = []
    for mod, leaves in [
        ("norm1", ("weight", "bias")),
        ("attn.qkv", ("weight", "bias")),
        ("attn.proj", ("weight", "bias")),
        ("norm2", ("weight", "bias")),
        ("mlp.fc1", ("weight", "bias")),
        ("mlp.fc2", ("weight", "bias")),
    ]:
        ks += [f"{prefix}{mod}.{l}" for l in leaves]
    if qk_norm:
        ks += [f"{prefix}attn.{n}.{l}" for n in ("q_norm", "k_norm")
               for l in ("weight", "bias")]
    if layerscale:
        ks += [f"{prefix}ls1.gamma", f"{prefix}ls2.gamma"]
    return ks


def _dpt_keys(head):
    ks = []
    for i in range(4):
        ks += [f"{head}.projects.{i}.weight", f"{head}.projects.{i}.bias"]
    for i in (0, 1, 3):  # 2 is nn.Identity
        ks += [f"{head}.resize_layers.{i}.weight",
               f"{head}.resize_layers.{i}.bias"]
    for i in range(1, 5):
        ks += [f"{head}.scratch.layer{i}_rn.weight"]  # bias=False
        rn = f"{head}.scratch.refinenet{i}"
        for unit in ("resConfUnit1", "resConfUnit2"):
            for conv in ("conv1", "conv2"):
                ks += [f"{rn}.{unit}.{conv}.weight", f"{rn}.{unit}.{conv}.bias"]
        ks += [f"{rn}.out_conv.weight", f"{rn}.out_conv.bias"]
    ks += [f"{head}.scratch.output_conv1.weight",
           f"{head}.scratch.output_conv1.bias",
           f"{head}.scratch.output_conv2.0.weight",
           f"{head}.scratch.output_conv2.0.bias",
           f"{head}.scratch.output_conv2.2.weight",
           f"{head}.scratch.output_conv2.2.bias"]
    return ks


def expected_vggt_keys(embed_depth, depth, trunk_depth=4):
    """Every key of the public facebook/VGGT-1B state dict (model naming:
    vggt/models/aggregator.py, heads/camera_head.py, heads/dpt_head.py,
    DINOv2 vit_large backbone), parameterized by depth so a tiny config
    enumerates the same *surface*."""
    ks = [
        "aggregator.patch_embed.cls_token",
        "aggregator.patch_embed.pos_embed",
        "aggregator.patch_embed.register_tokens",
        "aggregator.patch_embed.mask_token",
        "aggregator.patch_embed.patch_embed.proj.weight",
        "aggregator.patch_embed.patch_embed.proj.bias",
        "aggregator.patch_embed.norm.weight",
        "aggregator.patch_embed.norm.bias",
        "aggregator.camera_token",
        "aggregator.register_token",
    ]
    for i in range(embed_depth):  # DINOv2: no qk-norm, LayerScale init 1.0
        ks += _block_keys(f"aggregator.patch_embed.blocks.{i}.", qk_norm=False)
    for i in range(depth):  # alternating attention: qk-norm + LayerScale .01
        ks += _block_keys(f"aggregator.frame_blocks.{i}.", qk_norm=True)
        ks += _block_keys(f"aggregator.global_blocks.{i}.", qk_norm=True)
    ks += ["camera_head.token_norm.weight", "camera_head.token_norm.bias"]
    for i in range(trunk_depth):  # camera trunk: LayerScale, no qk-norm
        ks += _block_keys(f"camera_head.trunk.{i}.", qk_norm=False)
    ks += [
        "camera_head.trunk_norm.weight", "camera_head.trunk_norm.bias",
        "camera_head.empty_pose_tokens",
        "camera_head.embed_pose.weight", "camera_head.embed_pose.bias",
        "camera_head.poseLN_modulation.1.weight",
        "camera_head.poseLN_modulation.1.bias",
        "camera_head.pose_branch.fc1.weight", "camera_head.pose_branch.fc1.bias",
        "camera_head.pose_branch.fc2.weight", "camera_head.pose_branch.fc2.bias",
    ]
    ks += _dpt_keys("depth_head")
    ks += _dpt_keys("point_head")
    return ks


# ---------------------------------------------------------------------------
# our params -> real VGGT naming/layout (inverse of the converter)
# ---------------------------------------------------------------------------

INVERSE_RULES = [
    (r"^params\.core\.aggregator\.patch_embed\.proj\.(.*)$",
     r"aggregator.patch_embed.patch_embed.proj.\1"),
    (r"^params\.core\.aggregator\.patch_embed\.(pos_embed|cls_token|register_tokens)$",
     r"aggregator.patch_embed.\1"),
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
    (r"^params\.core\.camera_head\.trunk_(\d+)\.(.*)$", r"camera_head.trunk.\1.\2"),
    (r"^params\.core\.camera_head\.modulation\.(.*)$",
     r"camera_head.poseLN_modulation.1.\1"),
    (r"^params\.core\.camera_head\.(.*)$", r"camera_head.\1"),
    (r"^params\.core\.(depth_head|point_head)\.project_(\d)\.(.*)$",
     r"\1.projects.\2.\3"),
    (r"^params\.core\.(depth_head|point_head)\.resize_layer_(\d)\.(.*)$",
     r"\1.resize_layers.\2.\3"),
    (r"^params\.core\.(depth_head|point_head)\.scratch_(\d)\.(.*)$", None),
    (r"^params\.core\.(depth_head|point_head)\.fusion_(\d)\.rcu([12])\.(.*)$", None),
    (r"^params\.core\.(depth_head|point_head)\.fusion_(\d)\.out_conv\.(.*)$", None),
    (r"^params\.core\.(depth_head|point_head)\.head_conv1\.(.*)$",
     r"\1.scratch.output_conv1.\2"),
    (r"^params\.core\.(depth_head|point_head)\.head_conv2\.(.*)$",
     r"\1.scratch.output_conv2.0.\2"),
    (r"^params\.core\.(depth_head|point_head)\.head_out\.(.*)$",
     r"\1.scratch.output_conv2.2.\2"),
    # track head: the tracker's torch ModuleList/Sequential indices are our
    # flattened _N module names; the DPT feature_extractor reuses the DPT
    # rules via _DPT_HEAD_RE below
    (r"^params\.core\.track_head\.tracker\.updateformer\.(time_blocks"
     r"|space_virtual_blocks|space_point2virtual_blocks"
     r"|space_virtual2point_blocks)_(\d+)\.(.*)$",
     r"track_head.tracker.updateformer.\1.\2.\3"),
    (r"^params\.core\.track_head\.tracker\.(ffeat_updater|vis_predictor"
     r"|conf_predictor)_0\.(.*)$",
     r"track_head.tracker.\1.0.\2"),
    (r"^params\.core\.track_head\.tracker\.(.*)$", r"track_head.tracker.\1"),
    (r"^params\.alignment_head\.(.*)$", r"alignment_head.\1"),
]


# heads that hold a (possibly feature-only) DPT decoder
_DPT_HEAD_RE = r"(depth_head|point_head|track_head\.feature_extractor)"


def to_vggt_name(our_key: str) -> str:
    head, _, leaf = our_key.rpartition(".")
    if leaf in ("kernel", "scale"):
        leaf = "weight"
    key = f"{head}.{leaf}"
    m = re.match(rf"^params\.core\.{_DPT_HEAD_RE}\.scratch_(\d)\.(.*)$", key)
    if m:
        return f"{m.group(1)}.scratch.layer{int(m.group(2)) + 1}_rn.{m.group(3)}"
    m = re.match(
        rf"^params\.core\.{_DPT_HEAD_RE}\.fusion_(\d)\.rcu([12])\.(.*)$", key)
    if m:
        return (f"{m.group(1)}.scratch.refinenet{int(m.group(2)) + 1}"
                f".resConfUnit{m.group(3)}.{m.group(4)}")
    m = re.match(
        rf"^params\.core\.{_DPT_HEAD_RE}\.fusion_(\d)\.out_conv\.(.*)$", key)
    if m:
        return f"{m.group(1)}.scratch.refinenet{int(m.group(2)) + 1}.out_conv.{m.group(3)}"
    m = re.match(
        rf"^params\.core\.{_DPT_HEAD_RE}\.(project_\d|resize_layer_\d"
        rf"|head_conv1|head_conv2|head_out)\.(.*)$", key)
    if m and m.group(1) == "track_head.feature_extractor":
        rest = {"head_conv1": "scratch.output_conv1",
                "head_conv2": "scratch.output_conv2.0",
                "head_out": "scratch.output_conv2.2"}.get(m.group(2))
        if rest is None:
            mod = m.group(2).replace("project_", "projects.").replace(
                "resize_layer_", "resize_layers.")
            rest = mod
        return f"{m.group(1)}.{rest}.{m.group(3)}"
    for pat, repl in INVERSE_RULES:
        if repl is not None and re.match(pat, key):
            return re.sub(pat, repl, key)
    raise KeyError(our_key)


def inverse_transform_value(vggt_key: str, v: np.ndarray) -> np.ndarray:
    """Our torch-style value -> the layout the real checkpoint stores."""
    if re.match(r"^aggregator\.(camera_token|register_token)$", vggt_key):
        return v[None]  # (2, K, C) -> (1, 2, K, C)
    if re.match(r"^(depth_head|point_head)\.resize_layers\.[01]\.weight$", vggt_key):
        return v.transpose(1, 0, 2, 3)  # our-torch OIHW -> ConvTranspose IOHW
    return v


def _tiny_model_and_sd():
    kw = tiny_model_kwargs(num_memory_tokens=4, align_embed_dim=32,
                           align_dec_dim=16)
    model = FeatureAlignedVGGT(**kw)
    imgs = jnp.zeros((1, 2, 3, 28, 42))
    params = model.init(jax.random.PRNGKey(0), imgs, 1)
    ours = export_torch_style(params)
    vggt_sd = {to_vggt_name(k): inverse_transform_value(to_vggt_name(k), v)
               for k, v in ours.items()}
    return model, imgs, params, vggt_sd, kw


# real-checkpoint keys our model intentionally has no slot for: DINOv2's
# masked-training token, and refinenet4's skip-branch conv unit (the deepest
# fusion takes no skip input, so VGGT never runs those params either)
EXPECTED_DROPS = {"aggregator.patch_embed.mask_token"} | {
    f"{h}.scratch.refinenet4.resConfUnit1.{c}.{l}"
    for h in ("depth_head", "point_head")
    for c in ("conv1", "conv2") for l in ("weight", "bias")
}


def test_key_surface_matches_vggt1b():
    """Our exported core surface == the enumerated real VGGT-1B key set
    (modulo the documented dead-weight drops, and alignment_head, which
    VGGT-1B doesn't have)."""
    _, _, _, vggt_sd, kw = _tiny_model_and_sd()
    core = {k for k in vggt_sd if not k.startswith("alignment_head.")}
    expected = set(expected_vggt_keys(
        embed_depth=kw["patch_embed_depth"], depth=kw["depth"]))
    assert expected - core == EXPECTED_DROPS, \
        sorted((expected - core) ^ EXPECTED_DROPS)[:10]
    assert core - expected == set(), sorted(core - expected)[:10]


def test_real_layout_state_dict_imports_exactly():
    """A real-layout state dict (incl. mask_token) translates with zero
    unmatched keys and imports back to the exact source params."""
    _, _, params, vggt_sd, _ = _tiny_model_and_sd()
    for k in EXPECTED_DROPS:  # present in the real checkpoint, dropped by us
        vggt_sd[k] = np.zeros((1, 32), np.float32)

    mapped, unmatched = {}, []
    for k, v in vggt_sd.items():
        nk = translate_key(k)
        if nk is None:
            if k not in EXPECTED_DROPS:
                unmatched.append(k)
            continue
        mapped[nk] = transform_value(k, np.asarray(v))
    assert not unmatched, unmatched[:10]

    restored, missing = import_torch_style(mapped, params, strict=False)
    assert not missing, missing[:10]
    for (pa, a), (pb, b) in zip(
        sorted(export_torch_style(params).items()),
        sorted(export_torch_style(restored).items()),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=pa)


def test_vggt1b_only_checkpoint_leaves_alignment_at_init():
    """Importing a pure VGGT-1B dict (no alignment_head) fills only the
    alignment head from init — the documented 3-tier fallback path."""
    _, _, params, vggt_sd, _ = _tiny_model_and_sd()
    core_sd = {k: v for k, v in vggt_sd.items()
               if not k.startswith("alignment_head.")}
    mapped = {translate_key(k): transform_value(k, np.asarray(v))
              for k, v in core_sd.items() if translate_key(k) is not None}
    _, missing = import_torch_style(mapped, params, strict=False)
    assert missing, "expected alignment_head keys to be missing"
    assert all(k.startswith("params.alignment_head.") for k in missing), \
        [k for k in missing if not k.startswith("params.alignment_head.")][:10]


# ---------------------------------------------------------------------------
# torch as the layout oracle
# ---------------------------------------------------------------------------

def test_strided_upsample_matches_torch_convtranspose():
    """Our StridedUpsample + the converter's IOHW rule == torch
    ConvTranspose2d(k=s) bit-for-bit (fp32)."""
    torch = pytest.importorskip("torch")
    from vitslam_tpu.models.dpt_head import StridedUpsample

    rng = np.random.default_rng(0)
    cin, cout, k = 6, 5, 4
    x = rng.normal(size=(2, cin, 3, 3)).astype(np.float32)
    tl = torch.nn.ConvTranspose2d(cin, cout, k, stride=k)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()  # (2, cout, 12, 12)

    w_iohw = tl.weight.detach().numpy()  # (cin, cout, k, k)
    # converter pipeline: IOHW -> OIHW (transform_value) -> HWIO (generic)
    w_oihw = w_iohw.transpose(1, 0, 2, 3)
    w_flax = w_oihw.transpose(2, 3, 1, 0)
    params = {"params": {"kernel": jnp.asarray(w_flax),
                         "bias": jnp.asarray(tl.bias.detach().numpy())}}
    mod = StridedUpsample(features=cout, factor=k, dtype=jnp.float32)
    got = mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-5)


def test_conv_matches_torch_strided_conv():
    """flax nn.Conv + the generic OIHW->HWIO rule == torch Conv2d(3, s=2,
    p=1) — the DPT resize_layers.3 shape."""
    torch = pytest.importorskip("torch")
    import flax.linen as fnn

    rng = np.random.default_rng(1)
    cin = cout = 5
    x = rng.normal(size=(1, cin, 8, 8)).astype(np.float32)
    tl = torch.nn.Conv2d(cin, cout, 3, stride=2, padding=1)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()
    w_flax = tl.weight.detach().numpy().transpose(2, 3, 1, 0)
    params = {"params": {"kernel": jnp.asarray(w_flax),
                         "bias": jnp.asarray(tl.bias.detach().numpy())}}
    mod = fnn.Conv(cout, (3, 3), strides=(2, 2), padding=1, dtype=jnp.float32)
    got = mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# golden outputs of a converted model (VERDICT #4: "golden outputs of the
# converted model on a fixed input")
# ---------------------------------------------------------------------------

# (mean, std, middle element) of each VGGTCore output after importing a
# deterministic real-layout state dict — regenerate with the recipe in the
# test if conversion semantics intentionally change.
GOLDEN_CORE_OUTPUTS = {
    "depth": (9.592359e+01, 1.069130e+02, 7.834963e+00),
    "depth_conf": (8.194043e+00, 1.020224e+01, 1.673589e+00),
    "pose_enc_list": (1.895914e-02, 2.118003e-01, -3.555460e-01),
    "world_points": (3.866866e+01, 1.990315e+02, 1.125484e+01),
    "world_points_conf": (1.983376e+01, 7.435326e+01, 1.274500e+00),
}


def test_converted_model_golden_outputs():
    """End-to-end conversion determinism: a synthetic state dict with REAL
    VGGT-1B naming and layouts (values seeded per key name), pushed through
    translate_key/transform_value/import_torch_style, must reproduce the
    recorded forward outputs — so neither the key rules, the layout
    transforms, nor the model's numerics can drift silently."""
    import hashlib

    model, _, params, vggt_sd, _ = _tiny_model_and_sd()

    def val_for(key, shape):
        seed = int.from_bytes(hashlib.sha256(key.encode()).digest()[:4],
                              "little")
        return (np.random.default_rng(seed).normal(0, 0.05, size=shape)
                .astype(np.float32))

    sd = {k: val_for(k, np.asarray(v).shape) for k, v in vggt_sd.items()
          if not k.startswith("alignment_head.")}
    mapped = {translate_key(k): transform_value(k, v) for k, v in sd.items()
              if translate_key(k) is not None}
    restored, missing = import_torch_style(mapped, params, strict=False)
    assert all(m.startswith("params.alignment_head.") for m in missing)

    x = (jnp.arange(1 * 2 * 3 * 28 * 42, dtype=jnp.float32)
         .reshape(1, 2, 3, 28, 42) % 97) / 97.0
    out = model.apply(restored, x, method=lambda m, x: m.core(x))
    for k, (mean, std, mid) in GOLDEN_CORE_OUTPUTS.items():
        v = out[k]
        if isinstance(v, list):
            v = v[-1]
        v = np.asarray(v, np.float64)
        np.testing.assert_allclose(
            [v.mean(), v.std(), float(v.ravel()[v.size // 2])],
            [mean, std, mid], rtol=2e-3,
            err_msg=f"converted-model output {k} drifted")


# ---------------------------------------------------------------------------
# track head (VERDICT r2 Next #5 / weak #6): the VGGT-1B checkpoint ships
# trained track weights and the reference instantiates TrackHead in every
# model (aligned_vggt/models/featureAligned_vggt.py:30) — the converter must
# round-trip them. Surface reconstructed from the public VGGT/CoTracker-2
# module code (vggt/heads/track_head.py + track_modules/*), which is not
# downloadable here.
# ---------------------------------------------------------------------------

TRACK_UPDATER_DEPTH = 2


def _trackblock_keys(prefix, cross=False):
    attn = "cross_attn" if cross else "attn"
    mods = [("norm1", ("weight", "bias"))]
    if cross:
        mods.append(("norm_context", ("weight", "bias")))
    mods += [
        (f"{attn}.to_q", ("weight", "bias")),
        (f"{attn}.to_kv", ("weight", "bias")),
        (f"{attn}.to_out", ("weight", "bias")),
        ("norm2", ("weight", "bias")),
        ("mlp.fc1", ("weight", "bias")),
        ("mlp.fc2", ("weight", "bias")),
    ]
    return [f"{prefix}{m}.{l}" for m, ls in mods for l in ls]


def expected_track_keys(depth=TRACK_UPDATER_DEPTH):
    # DPT in feature_only mode: everything up to scratch.output_conv1, no
    # output_conv2 head
    ks = [k for k in _dpt_keys("track_head.feature_extractor")
          if "output_conv2" not in k]
    t = "track_head.tracker."
    ks += [t + "fmap_norm.weight", t + "fmap_norm.bias",
           t + "corr_mlp.fc1.weight", t + "corr_mlp.fc1.bias",
           t + "corr_mlp.fc2.weight", t + "corr_mlp.fc2.bias",
           t + "query_ref_token"]
    u = t + "updateformer."
    ks += [u + "input_transform.weight", u + "input_transform.bias",
           u + "flow_head.weight", u + "flow_head.bias",
           u + "virual_tracks"]  # sic — cotracker's original param name
    for i in range(depth):
        ks += _trackblock_keys(f"{u}time_blocks.{i}.")
        ks += _trackblock_keys(f"{u}space_point2virtual_blocks.{i}.", cross=True)
        ks += _trackblock_keys(f"{u}space_virtual_blocks.{i}.")
        ks += _trackblock_keys(f"{u}space_virtual2point_blocks.{i}.", cross=True)
    ks += [t + "ffeat_norm.weight", t + "ffeat_norm.bias",
           t + "ffeat_updater.0.weight", t + "ffeat_updater.0.bias",
           t + "vis_predictor.0.weight", t + "vis_predictor.0.bias",
           t + "conf_predictor.0.weight", t + "conf_predictor.0.bias"]
    return ks


TRACK_EXPECTED_DROPS = {
    f"track_head.feature_extractor.scratch.refinenet4.resConfUnit1.{c}.{l}"
    for c in ("conv1", "conv2") for l in ("weight", "bias")
}


def _tiny_track_and_sd():
    from vitslam_tpu.models import TrackHead

    head = TrackHead(dim_in=32, patch_size=14, features=8, stride=2,
                     iters=1, corr_levels=2, corr_radius=1, hidden_size=16,
                     updater_depth=TRACK_UPDATER_DEPTH, dtype=jnp.float32)
    gh, gw, psi = 2, 3, 5
    taps = [jnp.zeros((1, 2, psi + gh * gw, 32))] * 4
    imgs = jnp.zeros((1, 2, 3, gh * 14, gw * 14))
    q = jnp.asarray([[[3.0, 4.0], [10.0, 6.0]]])
    params = head.init(jax.random.PRNGKey(0), taps, imgs, psi, q)
    ours = export_torch_style(params)
    # the standalone head's tree roots at 'params.'; in the full model it
    # sits at params.core.track_head (scripts/convert_vggt_checkpoint.py
    # grafts exactly this subtree into the conversion template)
    ours = {k.replace("params.", "params.core.track_head.", 1): v
            for k, v in ours.items()}
    sd = {to_vggt_name(k): inverse_transform_value(to_vggt_name(k), v)
          for k, v in ours.items()}
    return head, (taps, imgs, psi, q), params, sd


def test_track_key_surface_matches_vggt1b():
    """Exported track-head surface == the enumerated checkpoint track keys
    (modulo refinenet4's dead skip-unit, as for the other DPT heads)."""
    _, _, _, sd = _tiny_track_and_sd()
    expected = set(expected_track_keys())
    got = set(sd)
    assert expected - got == TRACK_EXPECTED_DROPS, \
        sorted((expected - got) ^ TRACK_EXPECTED_DROPS)[:10]
    assert got - expected == set(), sorted(got - expected)[:10]


def test_track_state_dict_roundtrips():
    """A real-naming track_head.* dict translates with zero unmatched keys
    and imports back to the exact source params."""
    _, _, params, sd = _tiny_track_and_sd()
    for k in TRACK_EXPECTED_DROPS:
        sd[k] = np.zeros((1, 8), np.float32)
    mapped, unmatched = {}, []
    for k, v in sd.items():
        nk = translate_key(k)
        if nk is None:
            if k not in TRACK_EXPECTED_DROPS:
                unmatched.append(k)
            continue
        # strip the full-model prefix back to the standalone head's tree
        nk = nk.replace("params.core.track_head.", "params.", 1)
        mapped[nk] = transform_value(k, np.asarray(v))
    assert not unmatched, unmatched[:10]
    restored, missing = import_torch_style(mapped, params, strict=False)
    assert not missing, missing[:10]
    for (pa, a), (pb, b) in zip(
        sorted(export_torch_style(params).items()),
        sorted(export_torch_style(restored).items()),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=pa)


def test_converted_track_golden_outputs():
    """Conversion + tracker-forward determinism: a synthetic real-naming
    track state dict (values seeded per key name) pushed through the
    converter must reproduce recorded outputs on a fixed input."""
    import hashlib

    head, (taps, imgs, psi, q), params, sd = _tiny_track_and_sd()

    def val_for(key, shape):
        seed = int.from_bytes(hashlib.sha256(key.encode()).digest()[:4],
                              "little")
        return (np.random.default_rng(seed).normal(0, 0.05, size=shape)
                .astype(np.float32))

    sd = {k: val_for(k, np.asarray(v).shape) for k, v in sd.items()}
    mapped = {translate_key(k).replace("params.core.track_head.", "params.", 1):
              transform_value(k, v) for k, v in sd.items()
              if translate_key(k) is not None}
    restored, missing = import_torch_style(mapped, params, strict=False)
    assert not missing, missing[:10]

    rich_taps = [(jnp.arange(t.size, dtype=jnp.float32).reshape(t.shape)
                  % 89) / 89.0 for t in taps]
    tracks, vis, conf = head.apply(restored, rich_taps, imgs, psi, q)
    got = []
    for v in (tracks, vis, conf):
        v = np.asarray(v, np.float64)
        got += [v.mean(), v.std(), float(v.ravel()[v.size // 2])]
    want = [5.682060e+00, 2.670403e+00, 2.890168e+00,
            4.993748e-01, 2.168468e-05, 4.993916e-01,
            5.108497e-01, 5.498670e-06, 5.108575e-01]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-7,
                               err_msg="converted-tracker outputs drifted")

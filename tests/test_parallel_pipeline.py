"""Multi-chip SERVING path: ChunkedPipeline with a device mesh shards the
chunk-group encode over the mesh's first axis (chunks are independent —
encode scales with chips) and must be numerically identical to the
unsharded pipeline. Runs on the 8-virtual-device CPU platform."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from vitslam_tpu.models import FeatureAlignedVGGT
from vitslam_tpu.slam import ChunkedPipeline
from vitslam_tpu.utils.testing import make_synthetic_batch, tiny_model_kwargs


def test_mesh_sharded_encode_matches_unsharded():
    kw = tiny_model_kwargs(num_memory_tokens=4, align_embed_dim=32,
                           align_dec_dim=16)
    model = FeatureAlignedVGGT(**kw)
    batch = make_synthetic_batch(B=1, N=10, H=28, W=42)
    images = jnp.asarray(batch["images"])

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    pipe_m = ChunkedPipeline(model, encode_batch=4, mesh=mesh)
    params = pipe_m.init_params(jax.random.PRNGKey(0), images[:, :4], 1)

    pipe_s = ChunkedPipeline(model, params=params, encode_batch=4)

    out_m, _ = pipe_m.run_sequence({"images": images}, chunk_width=4, num_overlap=1)
    out_s, _ = pipe_s.run_sequence({"images": images}, chunk_width=4, num_overlap=1)
    for k in out_s:
        np.testing.assert_allclose(
            np.asarray(out_m[k]), np.asarray(out_s[k]), atol=1e-4, rtol=1e-3,
            err_msg=k)


def test_mesh_sharded_encode_tail_group():
    """A tail group smaller than the mesh axis gets padded and still
    matches (3 chunks on a 2-device axis)."""
    kw = tiny_model_kwargs(num_memory_tokens=0, align_embed_dim=32,
                           align_dec_dim=16)
    model = FeatureAlignedVGGT(**kw)
    batch = make_synthetic_batch(B=1, N=8, H=28, W=42, seed=3)
    images = jnp.asarray(batch["images"])

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    pipe_m = ChunkedPipeline(model, encode_batch=2, mesh=mesh)
    params = pipe_m.init_params(jax.random.PRNGKey(1), images[:, :4], 1)
    pipe_s = ChunkedPipeline(model, params=params, encode_batch=2)

    out_m, _ = pipe_m.run_sequence({"images": images}, chunk_width=4, num_overlap=2)
    out_s, _ = pipe_s.run_sequence({"images": images}, chunk_width=4, num_overlap=2)
    for k in out_s:
        np.testing.assert_allclose(
            np.asarray(out_m[k]), np.asarray(out_s[k]), atol=1e-4, rtol=1e-3,
            err_msg=k)

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


class TestSequenceParallel:
    """SURVEY §5.7 sequence parallelism: the chunk frame axis sharded over
    a mesh axis, global attention all-gathering K/V per layer — numerics
    must equal the single-device encode exactly (same kernels; the gather
    only changes data placement)."""

    def _models(self, n_axis):
        from vitslam_tpu.models import PointAlignedVGGT

        kw = tiny_model_kwargs(enable_depth=True)
        kw.pop("align_embed_dim", None)
        sp = PointAlignedVGGT(**kw, seq_axis="model")
        ref = PointAlignedVGGT(**kw)
        return sp, ref

    def test_sp_encode_matches_unsharded(self):
        from vitslam_tpu.parallel import make_mesh, sequence_parallel_encode

        n = 8
        mesh = make_mesh(n_data=1, n_model=n)
        sp_model, ref_model = self._models(n)
        batch = make_synthetic_batch(B=1, N=n, H=28, W=42, seed=7)
        images = jnp.asarray(batch["images"])

        params = ref_model.init(jax.random.PRNGKey(0), images, 1)
        raw_ref = ref_model.apply(params, images,
                                  method=ref_model.encode_chunks)
        raw_sp = sequence_parallel_encode(sp_model, params, images, mesh,
                                          axis="model")
        assert set(raw_sp) == set(raw_ref)
        for k in raw_ref:
            np.testing.assert_allclose(
                np.asarray(raw_sp[k], np.float32),
                np.asarray(raw_ref[k], np.float32),
                atol=2e-4, rtol=1e-3, err_msg=k)

    def test_sp_first_frame_token_variant(self):
        """The global-frame-0 camera/register token variant must follow the
        GLOBAL index under sharding: only the device holding frame 0 uses
        variant 0 (aggregator.expand_frame_tokens frame_offset)."""
        from vitslam_tpu.models.aggregator import expand_frame_tokens

        param = jnp.asarray(np.stack([np.full((1, 4), 1.0),
                                      np.full((1, 4), 2.0)]), jnp.float32)
        t0 = expand_frame_tokens(param, 1, 2, frame_offset=0)
        t1 = expand_frame_tokens(param, 1, 2, frame_offset=2)
        np.testing.assert_allclose(np.asarray(t0)[:, 0, 0], [1.0, 2.0])
        np.testing.assert_allclose(np.asarray(t1)[:, 0, 0], [2.0, 2.0])

    def test_sp_rejects_indivisible(self):
        from vitslam_tpu.parallel import make_mesh, sequence_parallel_encode

        mesh = make_mesh(n_data=1, n_model=8)
        sp_model, ref_model = self._models(8)
        images = jnp.asarray(
            make_synthetic_batch(B=1, N=6, H=28, W=42)["images"])
        params = ref_model.init(jax.random.PRNGKey(0), images, 1)
        with pytest.raises(ValueError, match="pad the chunk"):
            sequence_parallel_encode(sp_model, params, images, mesh)


class TestSpawnHarness:
    """Port-retried gang launcher (parallel/spawn.py) used by the
    2-process tests and the pod dryrun (VERDICT r3 Weak #6)."""

    @pytest.mark.quick
    def test_gang_success_and_failure(self, tmp_path):
        from vitslam_tpu.parallel import python_worker_argv, spawn_gang

        ok = tmp_path / "ok.py"
        ok.write_text("import sys; print(f'worker {sys.argv[1]}: OK')\n")
        outs, port = spawn_gang(
            lambda pid, p: python_worker_argv(str(ok), pid, p), 2,
            timeout=60, retries=1)
        assert port > 0
        for i, o in enumerate(outs):
            assert f"worker {i}: OK" in o

        bad = tmp_path / "bad.py"
        bad.write_text("import sys; print('boom'); sys.exit(3)\n")
        with pytest.raises(RuntimeError, match="boom"):
            spawn_gang(lambda pid, p: python_worker_argv(str(bad), pid, p),
                       2, timeout=60, retries=0)

    @pytest.mark.quick
    def test_rendezvous_failure_retries_with_fresh_port(self, tmp_path):
        """A worker that fails with a rendezvous signature only on the
        first port it sees must succeed on the retry."""
        from vitslam_tpu.parallel import python_worker_argv, spawn_gang

        w = tmp_path / "flaky.py"
        marker = tmp_path / "first_port"
        w.write_text(
            "import sys, os\n"
            f"m = {str(repr(str(marker)))}\n"
            "if not os.path.exists(m):\n"
            "    open(m, 'w').write(sys.argv[2])\n"
            "if open(m).read() == sys.argv[2]:\n"
            "    print('Address already in use'); sys.exit(1)\n"
            "print(f'worker {sys.argv[1]}: OK after retry')\n")
        outs, _ = spawn_gang(
            lambda pid, p: python_worker_argv(str(w), pid, p), 2,
            timeout=60, retries=2)
        assert all("OK after retry" in o for o in outs)

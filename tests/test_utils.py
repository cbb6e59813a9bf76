"""Debug/profiling utilities + shape-bucket sampling."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestNanCheck:
    def test_detects_nan(self, caplog):
        import logging
        from vitslam_tpu.utils import debug

        debug.enable_nan_checks(True)
        try:
            x = jnp.asarray([1.0, np.nan, 2.0])
            with caplog.at_level(logging.WARNING):
                y = jax.jit(lambda t: debug.nan_check(t, "probe") * 2)(x)
                jax.block_until_ready(y)
            assert any("NaN/Inf" in r.message for r in caplog.records)
        finally:
            debug.enable_nan_checks(False)

    def test_noop_when_disabled(self):
        from vitslam_tpu.utils import debug

        x = jnp.asarray([np.nan])
        y = debug.nan_check(x, "quiet")
        assert y is x


class TestChunkTimer:
    def test_accounting(self):
        from vitslam_tpu.utils.profiling import ChunkTimer

        t = ChunkTimer()
        for _ in range(3):
            with t.chunk(new_frames=4):
                pass
        s = t.summary()
        assert s["chunks"] == 3 and s["frames"] == 12
        assert s["frames_per_sec"] > 0


class TestShapeBuckets:
    def test_bucket_sampling_validity(self):
        from vitslam_tpu.train.trainer import sample_chunk_shapes

        rng = np.random.default_rng(0)
        for S in (4, 7, 21, 40):
            w, o = sample_chunk_shapes(rng, S, [3, 20], [1, 5],
                                       buckets=[[5, 1], [10, 2], [20, 5]])
            assert S / w > 1 and o < w
        # without buckets: reference-exact sampling rules hold
        for S in (4, 7, 21, 40):
            w, o = sample_chunk_shapes(rng, S, [3, 20], [1, 5])
            assert S / w > 1 and o < w

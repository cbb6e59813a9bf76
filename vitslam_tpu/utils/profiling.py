"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference has none (tqdm only); this framework provides:
  * ``trace(log_dir)`` — context manager around jax.profiler for
    TensorBoard-viewable device traces;
  * ``annotate(name)`` — jax.profiler.TraceAnnotation for labeling pipeline
    phases inside a trace;
  * ``ChunkTimer`` — host-side per-chunk throughput accounting (chunks/sec
    and frames/sec, the BASELINE.json headline metrics) with a device fence
    callback (required on backends where block_until_ready is unreliable).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class ChunkTimer:
    """Accumulates per-chunk wall time; ``fence`` must force completion of
    the chunk's outputs (e.g. a tiny host readback)."""

    def __init__(self, fence: Optional[Callable] = None):
        self.fence = fence
        self.reset()

    def reset(self):
        self.chunks = 0
        self.frames = 0
        self.elapsed = 0.0

    @contextlib.contextmanager
    def chunk(self, new_frames: int):
        t0 = time.perf_counter()
        yield
        if self.fence is not None:
            self.fence()
        self.elapsed += time.perf_counter() - t0
        self.chunks += 1
        self.frames += new_frames

    @property
    def chunks_per_sec(self) -> float:
        return self.chunks / self.elapsed if self.elapsed else 0.0

    @property
    def frames_per_sec(self) -> float:
        return self.frames / self.elapsed if self.elapsed else 0.0

    def summary(self) -> dict:
        return {
            "chunks": self.chunks,
            "frames": self.frames,
            "elapsed_s": round(self.elapsed, 4),
            "chunks_per_sec": round(self.chunks_per_sec, 3),
            "frames_per_sec": round(self.frames_per_sec, 3),
        }

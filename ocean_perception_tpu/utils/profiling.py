"""Device profiling helpers around jax.profiler.

The reference profiles with ad-hoc Timer/StatsTracker prints (SURVEY.md §5.1).
On TPU the equivalent observability is (a) wall-clock stats on *synchronized*
step boundaries and (b) jax.profiler traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

from .timing import StatsTracker


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(stats: StatsTracker, key: str, *, sync: bool = True) -> Iterator[list]:
    """Time a region; append device outputs to the yielded list to sync on them.

        with timed(stats, "disparity") as outs:
            d = stereo_step(...)
            outs.append(d)
    """
    outputs: list = []
    t0 = time.perf_counter()
    yield outputs
    if sync and outputs:
        jax.block_until_ready(outputs)
    stats.add(key, (time.perf_counter() - t0) * 1e3)


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)

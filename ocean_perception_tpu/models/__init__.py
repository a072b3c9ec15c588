"""Composed end-to-end pipelines (the framework's 'model zoo').

The flagship is ``PerceptionPipeline``: raw stereo frames →
disparity → depth → underwater enhancement (→ tracking → meshing as those
stages land) in a single XLA graph with no host round-trips, batchable over
cameras and shardable over an ICI mesh (ocean_perception_tpu.parallel).
"""

from .perception import (  # noqa: F401
    FullFrontendOutput,
    PerceptionConfig,
    PerceptionOutput,
    full_frontend_step,
    perception_step,
)

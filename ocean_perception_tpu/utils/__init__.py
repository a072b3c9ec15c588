"""Host utilities: timing, stats, profiling, image IO."""

from .timing import Timer, StatsTracker, DataSubsampler  # noqa: F401

"""Pallas TPU kernels for the stereo hot path."""

from .cost_volume import pallas_cost_volume, pallas_supported  # noqa: F401

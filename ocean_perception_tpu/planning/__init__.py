"""Motion planning (reference: src/vehicle/rrt — explicitly abandoned there,
README.md:54; kept at parity as a working skeleton)."""

from .rrt import RrtStar, RrtParams  # noqa: F401

"""Fixed-capacity landmark track table — the front-end's state pytree.

Reference parity: StereoTracker's ``live_tracks_: map<lmk_id,
vector<LandmarkObservation>>`` (stereo_tracker.hpp:26-104) and
vision_core/landmark_observation.hpp (lmk_id, camera_id, pixel, disparity).

TPU design: an unordered map can't live under jit; instead K slots with
validity masks. Each slot carries the landmark id, its current pixel,
disparity, the pixel/disparity at its last *keyframe* observation (what the
VO front-end needs for 3D-2D correspondences), and bookkeeping ages. Host
code that wants full observation histories appends per-frame snapshots.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

# Plain int, NOT jnp.int32(-1): a device scalar here would initialize the
# JAX backend at import time, which hangs every host-side tool (evaluation
# CLI, dataset player --help) whenever the remote TPU tunnel is down.
INVALID_ID = -1


class LandmarkObservation(NamedTuple):
    """One frame's observations for all slots (static K)."""

    lmk_ids: jnp.ndarray     # (K,) int32, -1 = empty
    pixels: jnp.ndarray      # (K, 2) float32
    disparities: jnp.ndarray  # (K,) float32, -1 = no stereo match
    valid: jnp.ndarray       # (K,) bool


@struct.dataclass
class TrackTable:
    ids: jnp.ndarray            # (K,) int32 landmark ids, -1 = free slot
    pixels: jnp.ndarray         # (K, 2) current position
    disparities: jnp.ndarray    # (K,) current disparity (-1 = none)
    kf_pixels: jnp.ndarray      # (K, 2) position at last keyframe
    kf_disparities: jnp.ndarray  # (K,) disparity at last keyframe
    ages: jnp.ndarray           # (K,) frames since created
    missed: jnp.ndarray         # (K,) consecutive frames not tracked

    @classmethod
    def create(cls, capacity: int) -> "TrackTable":
        return cls(
            ids=jnp.full((capacity,), -1, jnp.int32),
            pixels=jnp.zeros((capacity, 2), jnp.float32),
            disparities=jnp.full((capacity,), -1.0, jnp.float32),
            kf_pixels=jnp.zeros((capacity, 2), jnp.float32),
            kf_disparities=jnp.full((capacity,), -1.0, jnp.float32),
            ages=jnp.zeros((capacity,), jnp.int32),
            missed=jnp.zeros((capacity,), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.ids.shape[0]

    @property
    def alive(self) -> jnp.ndarray:
        return self.ids >= 0

    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    def observation(self) -> LandmarkObservation:
        return LandmarkObservation(
            lmk_ids=self.ids,
            pixels=self.pixels,
            disparities=self.disparities,
            valid=self.alive,
        )

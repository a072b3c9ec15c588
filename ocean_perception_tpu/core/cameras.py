"""Camera models as JAX pytree dataclasses.

Reference parity: src/vehicle/vision_core/pinhole_camera.hpp:9-44 (fx,fy,cx,cy;
Project/Backproject/Rescale) and stereo_camera.hpp:10-46 (left/right rigs,
baseline, DispToDepth/DepthToDisp). Unlike the reference classes these are
immutable pytrees: intrinsics are traced leaves (so one compiled program
serves any calibration), image size is static metadata (it sets array shapes).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PinholeCamera:
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    height: int = struct.field(pytree_node=False, default=0)
    width: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, fx, fy, cx, cy, height=0, width=0) -> "PinholeCamera":
        f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return cls(f32(fx), f32(fy), f32(cx), f32(cy), int(height), int(width))

    def project(self, points_cam: jnp.ndarray) -> jnp.ndarray:
        """(…,3) camera-frame points → (…,2) pixel coords (u,v)."""
        x = points_cam[..., 0] / points_cam[..., 2]
        y = points_cam[..., 1] / points_cam[..., 2]
        return jnp.stack([self.fx * x + self.cx, self.fy * y + self.cy], axis=-1)

    def backproject(self, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """(…,2) pixels + (…,) depth → (…,3) camera-frame points."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        return jnp.stack([x * depth, y * depth, depth], axis=-1)

    def rescale(self, scale: float) -> "PinholeCamera":
        """Scale intrinsics for a resized image (pinhole_camera.hpp Rescale)."""
        return PinholeCamera(
            self.fx * scale,
            self.fy * scale,
            self.cx * scale,
            self.cy * scale,
            int(round(self.height * scale)),
            int(round(self.width * scale)),
        )


@struct.dataclass
class StereoCamera:
    left: PinholeCamera
    right: PinholeCamera
    baseline: jnp.ndarray  # meters between optical centers

    @classmethod
    def create(cls, left: PinholeCamera, right: PinholeCamera, baseline) -> "StereoCamera":
        return cls(left, right, jnp.asarray(baseline, dtype=jnp.float32))

    @property
    def fx(self) -> jnp.ndarray:
        return self.left.fx

    def disp_to_depth(self, disparity: jnp.ndarray) -> jnp.ndarray:
        """d [px] → z [m]; invalid (d<=0) maps to +inf (stereo_camera.hpp)."""
        safe = jnp.where(disparity > 0, disparity, 1.0)
        depth = self.fx * self.baseline / safe
        return jnp.where(disparity > 0, depth, jnp.inf)

    def depth_to_disp(self, depth: jnp.ndarray) -> jnp.ndarray:
        """z [m] → d [px]."""
        safe = jnp.where(depth > 0, depth, 1.0)
        disp = self.fx * self.baseline / safe
        return jnp.where(depth > 0, disp, jnp.inf)

    def rescale(self, scale: float) -> "StereoCamera":
        return StereoCamera(self.left.rescale(scale), self.right.rescale(scale), self.baseline)

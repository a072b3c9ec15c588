"""Multi-camera perception sharded over an ICI mesh.

Farm-scale static sensor packages (BASELINE.json north star): N cameras'
frames form a leading batch axis, sharded over the mesh 'cam' axis. Each
device runs the full perception step for its cameras; a cross-device psum
produces fleet-wide telemetry (the only collective the forward path needs —
everything else is embarrassingly camera-parallel, so it rides ICI at zero
cost beyond the final reduction).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.cameras import StereoCamera
from ..models.perception import PerceptionConfig, PerceptionOutput, perception_step


class FleetStats(NamedTuple):
    mean_depth: jnp.ndarray       # (N,) per-camera mean valid depth
    valid_fraction: jnp.ndarray   # (N,) per-camera valid-disparity fraction
    global_mean_depth: jnp.ndarray  # scalar, psum-reduced across the mesh


def _per_camera(left, right, rig: StereoCamera, config: PerceptionConfig) -> PerceptionOutput:
    return perception_step(left, right, rig, config)


def multi_camera_step(
    batch_left: jnp.ndarray,   # (N, H, W, 3)
    batch_right: jnp.ndarray,  # (N, H, W, 3)
    rig: StereoCamera,
    config: PerceptionConfig,
    mesh: Mesh,
    axis: str = "cam",
):
    """Jitted, sharded multi-camera step. Returns (PerceptionOutput, FleetStats).

    Outputs keep the camera axis sharded; only FleetStats.global_mean_depth
    crosses devices (one all-reduce over ICI).
    """
    cam_shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(cam_shard, cam_shard),
        out_shardings=(
            PerceptionOutput(cam_shard, cam_shard, cam_shard),
            FleetStats(cam_shard, cam_shard, repl),
        ),
    )
    def step(bl, br):
        out = jax.vmap(lambda l, r: _per_camera(l, r, rig, config))(bl, br)
        valid = out.depth > 0
        denom = jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1)
        mean_depth = jnp.sum(jnp.where(valid, out.depth, 0.0), axis=(1, 2)) / denom
        valid_fraction = jnp.mean(valid.astype(jnp.float32), axis=(1, 2))
        global_mean = jnp.mean(mean_depth)
        return out, FleetStats(mean_depth, valid_fraction, global_mean)

    return step(batch_left, batch_right)

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


def _b8_safe(config: PerceptionConfig, n_cams: int) -> PerceptionConfig:
    """{vmap >= 8 x fully-unrolled propagation} trips an XLA TPU
    fusion-emitter SIGABRT on this toolchain (docs/PERFORMANCE.md round-3
    diagnosis). scan_unroll=1 is the measured mitigation; it only affects
    the XLA fallback when the fused kernel is off or unavailable. A
    caller's explicit non-zero unroll is honored. Applied by EVERY
    camera-batched entry point (dense-only and full-frontend)."""
    if n_cams >= 8 and config.scan_unroll == 0:
        config = config.replace(scan_unroll=1)
    return config


def create_fleet_frontend_state(n_cams: int, mesher_params=None, image_shape=None):
    """Per-camera tracker states + landmark graphs batched on a leading
    camera axis (broadcast of the single-camera init pytrees)."""
    from ..mesher.landmark_graph import LandmarkGraph
    from ..mesher.object_mesher import ObjectMesherDeviceParams
    from ..tracking.stereo_tracker import StereoTrackerState

    mesher_params = mesher_params or ObjectMesherDeviceParams()
    state = StereoTrackerState.create(mesher_params.tracker, image_shape=image_shape)
    graph = LandmarkGraph.create(mesher_params.tracker.capacity)
    batch = lambda x: jnp.broadcast_to(x[None], (n_cams,) + x.shape)
    return (
        jax.tree_util.tree_map(batch, state),
        jax.tree_util.tree_map(batch, graph),
    )


@functools.lru_cache(maxsize=32)
def _frontend_step_fn(
    config: PerceptionConfig, mesher_params, mesh: Mesh, axis: str, mesher_scale: int
):
    """Cached jitted closure: a fresh closure per call would RETRACE every
    frame in streaming use (config/params/mesh are hashable statics; the rig
    pytree is a runtime argument)."""
    from ..models.perception import full_frontend_step

    cam_shard = NamedSharding(mesh, P(axis))

    def _prep(x):
        # Accept u8 and/or mono batches: the cast + channel broadcast run
        # ON DEVICE, so callers can ship 1 byte/pixel instead of 12 (the
        # farm node's wire frames are u8 mono; host->device transfer is the
        # wall on remote-attached rigs and a real PCIe cost everywhere).
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        if x.ndim == 3:  # (B, H, W) mono -> (B, H, W, 3)
            x = jnp.broadcast_to(x[..., None], x.shape + (3,))
        return x

    @functools.partial(
        jax.jit,
        in_shardings=(None, cam_shard, cam_shard, cam_shard, cam_shard, cam_shard),
        out_shardings=cam_shard,
    )
    def step(rig, states, gs, pg, bl, br):
        bl, br = _prep(bl), _prep(br)
        return jax.vmap(
            lambda s, g, p, l, r: full_frontend_step(
                s, g, p, l, r, rig, config, mesher_params, mesher_scale=mesher_scale
            )
        )(states, gs, pg, bl, br)

    return step


def multi_camera_frontend_step(
    tracker_states,            # pytree with leading (N,) camera axis
    graphs,                    # pytree with leading (N,) camera axis
    prev_grays: jnp.ndarray,   # (N, H, W)
    batch_left: jnp.ndarray,   # (N, H, W, 3)
    batch_right: jnp.ndarray,  # (N, H, W, 3)
    rig: StereoCamera,
    config: PerceptionConfig,
    mesher_params,
    mesh: Mesh,
    axis: str = "cam",
    mesher_scale: int = 1,
):
    """The FULL frontend (enhance → disparity → tracking → landmark graph)
    for N cameras, camera axis sharded over the mesh — the BASELINE north
    star's whole camera→mesh graph under ICI sharding, not just the dense
    half. Entirely camera-parallel: zero collectives in the forward path.

    ``mesher_scale``: run the tracking/mesher half at 1/s resolution (see
    full_frontend_step); prev_grays and the tracker-state image_shape must
    be at that scale.

    Returns ((FullFrontendOutput batched, cur_grays), ...) with every leaf
    sharded on the camera axis. Thread tracker_states/graphs/prev_grays
    between frames exactly like the single-camera full_frontend_step.
    """
    config = _b8_safe(config, int(batch_left.shape[0]))
    step = _frontend_step_fn(config, mesher_params, mesh, axis, int(mesher_scale))
    return step(rig, tracker_states, graphs, prev_grays, batch_left, batch_right)


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
    config = _b8_safe(config, int(batch_left.shape[0]))
    step = _multi_camera_step_fn(config, mesh, axis)
    return step(rig, batch_left, batch_right)


@functools.lru_cache(maxsize=32)
def _multi_camera_step_fn(config: PerceptionConfig, mesh: Mesh, axis: str):
    cam_shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(None, cam_shard, cam_shard),
        out_shardings=(
            PerceptionOutput(cam_shard, cam_shard, cam_shard),
            FleetStats(cam_shard, cam_shard, repl),
        ),
    )
    def step(rig, bl, br):
        out = jax.vmap(lambda l, r: _per_camera(l, r, rig, config))(bl, br)
        valid = out.depth > 0
        counts = jnp.sum(valid, axis=(1, 2))
        denom = jnp.maximum(counts, 1)
        mean_depth = jnp.sum(jnp.where(valid, out.depth, 0.0), axis=(1, 2)) / denom
        valid_fraction = jnp.mean(valid.astype(jnp.float32), axis=(1, 2))
        # Weight by valid-pixel counts: a blind camera (0 valid) must not
        # drag the fleet mean toward 0.
        global_mean = jnp.sum(mean_depth * counts) / jnp.maximum(jnp.sum(counts), 1)
        return out, FleetStats(mean_depth, valid_fraction, global_mean)

    return step


def sharded_perception_step(
    left_rgb: jnp.ndarray,
    right_rgb: jnp.ndarray,
    rig: StereoCamera,
    config: PerceptionConfig,
    mesh: Mesh,
    axis: str = "strip",
):
    """ONE frame's FULL perception (gray → pyramid → PatchMatch → depth →
    enhancement) solved cooperatively by every device on the mesh: image
    rows shard over `axis`. The latency-axis complement of the camera-
    parallel path — N chips cut single-frame latency instead of adding
    throughput.

    The dense stereo core runs under shard_map with explicit ppermute halo
    exchanges (parallel/stereo_sharded.py); everything around it is jit with
    sharding constraints, so XLA inserts the conv halos and turns the
    enhancement fits' global reductions into ICI collectives automatically.

    Requires engine='patchmatch' and internal heights divisible by the mesh
    axis size. Semantics: the stereo core equals the single-device engine
    with ``chunks_y = n_devices`` (each device is one y-strip).
    """
    if config.engine != "patchmatch":
        raise ValueError("sharded_perception_step supports the patchmatch engine")
    n = mesh.shape[axis]
    H = int(left_rgb.shape[0])
    scale = config.internal_scale
    if scale < 1 or (scale & (scale - 1)) != 0:
        # Same contract as perception_step: log2(scale) pyramid halvings.
        raise ValueError(f"internal_scale must be a power of two, got {scale}")
    if (H // max(scale, 1)) % n != 0:
        raise ValueError(f"internal height {H // max(scale, 1)} must divide over {n} devices")

    run = _sharded_perception_fn(config, mesh, axis)
    return run(rig, left_rgb, right_rgb)


@functools.lru_cache(maxsize=32)
def _sharded_perception_fn(config: PerceptionConfig, mesh: Mesh, axis: str):
    from ..imaging.enhance import enhance_underwater
    from ..models.perception import PerceptionOutput
    from ..ops.image import pyr_down, resize, to_grayscale
    from ..stereo.patchmatch import PatchMatchParams
    from .stereo_sharded import sharded_patchmatch

    scale = config.internal_scale
    d_small = config.max_disp // scale if scale > 1 else config.max_disp
    # Honor the config's tuning knobs like perception_step does (the fused
    # kernel is not used here: sharded_patchmatch IS the strip decomposition).
    pm = PatchMatchParams(
        max_disp=d_small, chunks=config.chunks, right_wta=True,
        volume_bf16=True, scan_unroll=config.scan_unroll,
    )
    rows = NamedSharding(mesh, P(axis))

    @jax.jit
    def run(rig, l, r):
        H, W = l.shape[0], l.shape[1]
        l = jax.lax.with_sharding_constraint(jnp.asarray(l, jnp.float32), rows)
        r = jax.lax.with_sharding_constraint(jnp.asarray(r, jnp.float32), rows)
        gray_l = to_grayscale(l)
        gray_r = to_grayscale(r)
        for _ in range(scale.bit_length() - 1):  # log2(scale) halvings
            gray_l = pyr_down(gray_l)
            gray_r = pyr_down(gray_r)
        gray_l = jax.lax.with_sharding_constraint(gray_l, rows)
        gray_r = jax.lax.with_sharding_constraint(gray_r, rows)

        res = sharded_patchmatch(gray_l, gray_r, mesh, pm, axis=axis)
        disp = res.left
        if scale > 1:
            disp = resize(disp, (H, W), method="nearest") * float(scale)
        disp = jax.lax.with_sharding_constraint(disp, rows)

        depth = rig.disp_to_depth(disp)
        depth = jnp.where(jnp.isfinite(depth) & (depth <= config.max_depth), depth, 0.0)

        if config.run_enhance:
            enhanced, _ = enhance_underwater(l, depth, config.enhance)
        else:
            enhanced = l
        return PerceptionOutput(disparity=disp, depth=depth, enhanced_left=enhanced)

    return run

"""Flagship perception step: stereo pair → disparity → depth → enhanced image.

This is the single-XLA-graph composition BASELINE.json's north star asks for
(camera→enhance→disparity with zero host round-trips). The reference runs
these as separate processes connected by LCM (patchmatch_gpu + imaging);
here one jitted function covers a frame, and vmap/pjit add the multi-camera
batch axis.

Operating point parity: the reference PatchMatch benchmark runs at /2 input
downsample with max_disp 128 at full scale (patchmatch_gpu_test.cpp:63-82);
``internal_scale=2`` reproduces that (disparity solved at half resolution
with D/2 planes, then upsampled and doubled).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..core.cameras import StereoCamera
from ..imaging.enhance import EnhanceParams, enhance_underwater
from ..ops.image import pyr_down, resize, to_grayscale
from ..stereo.api import StereoEngine, estimate_disparity
from ..stereo.patchmatch import PatchMatchParams
from ..stereo.sgm import SgmParams


@struct.dataclass
class PerceptionConfig:
    engine: str = struct.field(pytree_node=False, default="patchmatch")
    max_disp: int = struct.field(pytree_node=False, default=128)
    internal_scale: int = struct.field(pytree_node=False, default=2)
    max_depth: float = struct.field(pytree_node=False, default=20.0)
    enhance: EnhanceParams = struct.field(pytree_node=False, default=EnhanceParams())
    run_enhance: bool = struct.field(pytree_node=False, default=True)
    # Propagation-scan unroll (stereo.PatchMatchParams.scan_unroll). 0 = full
    # unroll — fastest single-frame/B<=4, but under a B>=8 vmap the giant
    # straight-line fusions SIGABRT the XLA TPU fusion emitter (pad_low=-4
    # internal check; docs/PERFORMANCE.md round-3 diagnosis). Use 1 for
    # B>=8 multi-camera batches — compiles and runs.
    scan_unroll: int = struct.field(pytree_node=False, default=0)
    # Route PatchMatch through the whole-frame fused Pallas kernel
    # (ops/pallas/fused_patchmatch.py): bit-identical, measured end-to-end
    # at the production point on v5e: B=1 298.3 vs 255.9 fps, B=2 281.3 vs
    # 227.5, B=4 275.0 vs 226.3 (1.17-1.24x; docs/PERFORMANCE.md). None =
    # AUTO: on when the backend is a real TPU (the one-time Mosaic compile
    # is ~126-141 s, cached persistently via utils/platform.
    # enable_compile_cache), off elsewhere (interpret mode at production
    # shapes is unusable). Outer camera-batch vmaps run the kernel
    # sequentially per frame (sequential_vmap; a vmap-derived pallas grid
    # double-buffers the VMEM-resident volumes past the 128 MB budget).
    use_pallas_fused: bool | None = struct.field(pytree_node=False, default=None)
    # Build the cost volume inside a Pallas kernel straight from the images
    # (ops/pallas/volume_build.py) instead of the XLA per-plane build —
    # removes the build's ~0.88 GB/frame of HBM intermediates plus the
    # layout transposes. Bit-identical for the production bf16 volume.
    # None = AUTO (stereo.PatchMatchParams.use_pallas_build resolution).
    use_pallas_build: bool | None = struct.field(pytree_node=False, default=None)
    # PatchMatch strip count (stereo.PatchMatchParams.chunks). 16 = the
    # reference's own decomposition and the measured single-frame/B=2
    # optimum (chunks=24/32 regress; docs/PERFORMANCE.md). Exposed because
    # batched multi-camera steps already carry a B-wide parallel axis, so
    # fewer/wider strips (less halo recompute) can win there.
    chunks: int = struct.field(pytree_node=False, default=16)


class PerceptionOutput(NamedTuple):
    disparity: jnp.ndarray      # (H, W) full-res left disparity, 0 = invalid
    depth: jnp.ndarray          # (H, W) meters, 0 = invalid/background
    enhanced_left: jnp.ndarray  # (H, W, 3) enhanced left RGB


def perception_step(
    left_rgb: jnp.ndarray,
    right_rgb: jnp.ndarray,
    rig: StereoCamera,
    config: PerceptionConfig = PerceptionConfig(),
) -> PerceptionOutput:
    """One frame through the dense-vision stack. Jit-safe, no host calls."""
    left_rgb = jnp.asarray(left_rgb, jnp.float32)
    right_rgb = jnp.asarray(right_rgb, jnp.float32)
    H, W = left_rgb.shape[0], left_rgb.shape[1]

    gray_l = to_grayscale(left_rgb)
    gray_r = to_grayscale(right_rgb)

    scale = config.internal_scale
    if scale & (scale - 1):
        raise ValueError(f"internal_scale must be a power of two, got {scale}")
    for _ in range(scale.bit_length() - 1):  # log2(scale) pyramid halvings
        gray_l = pyr_down(gray_l)
        gray_r = pyr_down(gray_r)

    d_small = config.max_disp // scale if scale > 1 else config.max_disp
    if config.engine == "patchmatch":
        # Production operating point: 16 strips (the reference's own
        # decomposition, patchmatch_gpu.cu) with FULLY UNROLLED propagation
        # scans (straight-line fused passes — the per-step while-loop
        # overhead was the latency floor; +35% pipeline fps), WTA right map
        # for the occlusion check, and a bf16 volume (halves the dominant
        # HBM stream). Quality verified <0.1 px median in tests/bench.
        fused = config.use_pallas_fused
        if fused is None:  # auto: real-TPU backends only (see field docstring)
            fused = jax.default_backend() == "tpu"
        pm = PatchMatchParams(
            max_disp=d_small, chunks=config.chunks, right_wta=True,
            volume_bf16=True, scan_unroll=config.scan_unroll,
            use_pallas_fused=fused,
            use_pallas_build=config.use_pallas_build,
        )
        result = estimate_disparity(gray_l, gray_r, engine=StereoEngine.PATCHMATCH, patchmatch_params=pm)
    elif config.engine == "sgm":
        sp = SgmParams(max_disp=d_small, scan_unroll=config.scan_unroll)
        result = estimate_disparity(gray_l, gray_r, engine=StereoEngine.SGM, sgm_params=sp)
    else:
        result = estimate_disparity(gray_l, gray_r, engine=StereoEngine.WTA, max_disp=d_small)

    disp = result.left
    if scale > 1:
        disp = resize(disp, (H, W), method="nearest") * float(scale)

    depth = rig.disp_to_depth(disp)
    depth = jnp.where(jnp.isfinite(depth) & (depth <= config.max_depth), depth, 0.0)

    if config.run_enhance:
        enhanced, _ = enhance_underwater(left_rgb, depth, config.enhance)
    else:
        enhanced = left_rgb

    return PerceptionOutput(disparity=disp, depth=depth, enhanced_left=enhanced)


class FullFrontendOutput(NamedTuple):
    perception: PerceptionOutput
    mesher: "object"        # mesher.MesherDeviceOutput
    tracker_state: "object"
    graph: "object"


def full_frontend_step(
    tracker_state,
    graph,
    prev_left_gray: jnp.ndarray,
    left_rgb: jnp.ndarray,
    right_rgb: jnp.ndarray,
    rig: StereoCamera,
    config: PerceptionConfig = PerceptionConfig(),
    mesher_params=None,
    mesher_scale: int = 1,
):
    """The BASELINE north star: camera → enhanced → disparity → tracked
    features → landmark-graph clusters in ONE jitted XLA graph, zero host
    round trips. Host code only threads state pytrees between frames and
    runs the (tiny) per-cluster Delaunay on the outputs.

    ``mesher_scale`` (power of two) runs the tracking/mesher half on
    pyr_down'ed grays — the reference mesher node's ``mesher_input_height``
    downscale (object_mesher_lcm.cpp:76-87), which is also where the fleet
    step's time goes at 720p (docs/PERFORMANCE.md fleet ablation: the
    tracking path is ~3x the dense path at B=4). Mesher pixels/disparities
    are then in DOWNSCALED coordinates: back-project them with
    ``rig.rescale(1 / mesher_scale)`` (exactly what ObjectMesherNode does),
    and create the tracker state with the downscaled image_shape. The
    perception half always runs full-res.

    Returns (FullFrontendOutput, cur_left_gray) — feed cur_left_gray back as
    prev_left_gray next frame; it is at MESHER scale (the only consumer is
    the next mesher step).
    """
    from ..mesher.object_mesher import ObjectMesherDeviceParams, mesher_device_step

    if mesher_scale < 1 or (mesher_scale & (mesher_scale - 1)):
        raise ValueError(f"mesher_scale must be a power of two, got {mesher_scale}")
    mesher_params = mesher_params or ObjectMesherDeviceParams()
    out = perception_step(left_rgb, right_rgb, rig, config)
    gray_l = to_grayscale(jnp.asarray(left_rgb, jnp.float32))
    gray_r = to_grayscale(jnp.asarray(right_rgb, jnp.float32))
    for _ in range(mesher_scale.bit_length() - 1):
        gray_l = pyr_down(gray_l)
        gray_r = pyr_down(gray_r)
    # fx scales with the image; disparities measured at 1/s resolution.
    fxb = rig.fx * rig.baseline / float(mesher_scale)
    new_state, new_graph, mesh_out = mesher_device_step(
        tracker_state, graph, prev_left_gray, gray_l, gray_r, fxb, mesher_params
    )
    return (
        FullFrontendOutput(
            perception=out, mesher=mesh_out, tracker_state=new_state, graph=new_graph
        ),
        gray_l,
    )

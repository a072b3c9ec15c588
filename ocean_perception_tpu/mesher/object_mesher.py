"""ObjectMesher: tracked landmarks → obstacle meshes.

Reference parity: mesher/object_mesher.{hpp,cpp} ProcessStereo (:183-345) —
1. StereoTracker::TrackAndTriangulate (the hot path),
2. EstimateForegroundMask (morph gradient at /4 scale),
3. landmark-graph evidence update gated by (a) 3D depth similarity
   (edge_max_depth_change) and (b) fraction of foreground pixels along the
   2D edge (edge_min_foreground_percent) — edges only between grid-NN pairs,
4. clusters = connected components of the thresholded subgraph,
5. per cluster >= 3 members: Delaunay (cv::Subdiv2D there, scipy here) and
   back-projection of vertices through their disparities.

TPU split: steps 1-4 are one jitted device step (`mesher_device_step`);
step 5 is host-side (tiny per-cluster vertex sets). The edge foreground
check samples S points along each pair's segment from the mask — a dense
(K, K, S) bilinear sample, lane-parallel, replacing the reference's
Bresenham CountEdgePixels.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.cameras import StereoCamera
from ..ops.interp import bilinear_sample
from ..tracking.stereo_tracker import (
    StereoTrackerParams,
    StereoTrackerState,
    track_and_triangulate,
)
from .foreground import estimate_foreground_mask
from .landmark_graph import LandmarkGraph, cluster_sizes, get_cluster_labels, update_graph
from .triangle_mesh import TriangleMesh


@struct.dataclass
class ObjectMesherDeviceParams:
    foreground_ksize: int = struct.field(pytree_node=False, default=15)
    foreground_min_gradient: float = struct.field(pytree_node=False, default=20.0)
    edge_min_foreground_percent: float = struct.field(pytree_node=False, default=0.9)
    edge_max_depth_change: float = struct.field(pytree_node=False, default=1.0)
    neighbor_radius_px: float = struct.field(pytree_node=False, default=80.0)
    min_obs_connect_edge: float = struct.field(pytree_node=False, default=7.0)
    min_obs_disconnect_edge: float = struct.field(pytree_node=False, default=4.0)
    edge_samples: int = struct.field(pytree_node=False, default=16)
    # Sample the foreground gate from a 1/f box-averaged mask with nearest
    # indexing (1 = exact full-res bilinear, the reference's behavior).
    fg_downsample: int = struct.field(pytree_node=False, default=4)
    # How the per-segment foreground samples are fetched when
    # fg_downsample > 1: "onehot" (default) reads each sample through
    # per-point bounded foreground patches + two exact one-hot MXU
    # contractions — bit-identical to "gather" for every pair inside
    # neighbor_radius_px (the only pairs update_graph consumes) and ~25x
    # faster on TPU, where the K^2*S advanced-index gather (640k scattered
    # loads per camera per frame at the defaults) was measured as the
    # dominant cost of the whole fleet step (docs/PERFORMANCE.md round 5).
    # "gather" keeps the plain advanced-indexing path (parity oracle).
    edge_gate_impl: str = struct.field(pytree_node=False, default="onehot")
    tracker: StereoTrackerParams = struct.field(pytree_node=False, default=StereoTrackerParams())


class MesherDeviceOutput(NamedTuple):
    labels: jnp.ndarray        # (K,) cluster label per slot (-1 dead)
    sizes: jnp.ndarray         # (K,) component size at root slots
    pixels: jnp.ndarray        # (K, 2)
    disparities: jnp.ndarray   # (K,)
    alive: jnp.ndarray         # (K,)
    foreground: jnp.ndarray    # (H, W) bool
    is_keyframe: jnp.ndarray


def _edge_fg_frac_onehot(
    fg_small: jnp.ndarray,   # (Hf, Wf) box-averaged foreground fraction
    pts: jnp.ndarray,        # (K, 2) tracked pixels (full-res coords)
    yy: jnp.ndarray,         # (K, K, S) clipped coarse row index per sample
    xx: jnp.ndarray,         # (K, K, S) clipped coarse col index per sample
    f: int,
    radius_px: float,
) -> jnp.ndarray:
    """Segment-sample foreground fractions WITHOUT the K^2*S gather.

    TPU gathers scalarize: `fg_small[yy, xx]` is 640k scattered loads per
    camera per frame at the defaults (K=200, S=16) — measured ~40 ms of the
    B=4 fleet step (docs/PERFORMANCE.md round 5), the single largest stage
    of the whole pipeline. Every sample of a pair inside neighbor_radius_px
    lies within radius_px of endpoint i, so it falls inside a bounded
    (R, R) patch of the coarse mask around point i. Each lookup then
    becomes two one-hot contractions over the bounded patch axes — MXU
    work, no gathers:

        val[i,j,s] = sum_a sum_b [ly==a][lx==b] patch_i[a, b]

    Bit-identity: for pairs within the radius the patch covers the clipped
    sample exactly (val == fg_small[yy, xx], each selection is 1*value);
    farther pairs clamp into the patch and may differ — but update_graph
    multiplies their evidence by pair_valid=0, so every mesher output
    (weights, labels, sizes) is bit-identical to the gather path (locked by
    tests/test_mesher.py::test_edge_gate_onehot_matches_gather).

    One-hots and the row-selected intermediate ride bf16 when f is a power
    of two: patch values are multiples of 1/f^2 (exact in bf16's 8-bit
    mantissa), selections are 0/1, and each row has exactly one nonzero, so
    even bf16 accumulation is exact. Non-power-of-two f falls back to f32
    HIGHEST (still ~6x faster than the gather).

    Reference: object_mesher.cpp CountEdgePixels (Bresenham walk over the
    full-res mask) — the S-sample approximation is the documented
    fg_downsample>1 operating point.
    """
    from ..ops.windows import extract_windows

    Hf, Wf = fg_small.shape
    rad = int(np.ceil(radius_px / f)) + 2  # +1 floor margin, +1 slack
    Ry = min(2 * rad + 1, Hf)
    Rx = min(2 * rad + 1, Wf)

    vy0 = jnp.clip(
        jnp.floor(pts[:, 1] / f).astype(jnp.int32) - rad, 0, Hf - Ry
    )
    vx0 = jnp.clip(
        jnp.floor(pts[:, 0] / f).astype(jnp.int32) - rad, 0, Wf - Rx
    )
    patches = extract_windows(fg_small, vy0, vx0, Ry, size_x=Rx)  # (K, Ry, Rx)

    ly = jnp.clip(yy - vy0[:, None, None], 0, Ry - 1)  # (K, K, S)
    lx = jnp.clip(xx - vx0[:, None, None], 0, Rx - 1)

    exact_bf16 = f & (f - 1) == 0 and f <= 16
    dt = jnp.bfloat16 if exact_bf16 else jnp.float32
    prec = None if exact_bf16 else jax.lax.Precision.HIGHEST
    oy = (ly[..., None] == jnp.arange(Ry, dtype=jnp.int32)).astype(dt)
    t_rows = jnp.einsum(
        "ijsa,iab->ijsb", oy, patches.astype(dt), precision=prec
    )  # (K, K, S, Rx) — each row is one selected patch row (exact values)
    ox = lx[..., None] == jnp.arange(Rx, dtype=jnp.int32)
    vals = jnp.sum(
        jnp.where(ox, t_rows, jnp.zeros((), dt)).astype(jnp.float32), axis=-1
    )  # one nonzero per (i,j,s): exact in any dtype
    return jnp.mean(vals, axis=-1)


def mesher_device_step(
    tracker_state: StereoTrackerState,
    graph: LandmarkGraph,
    prev_left: jnp.ndarray,
    cur_left: jnp.ndarray,
    cur_right: jnp.ndarray,
    fx_baseline: jnp.ndarray,
    params: ObjectMesherDeviceParams,
) -> Tuple[StereoTrackerState, LandmarkGraph, MesherDeviceOutput]:
    """Steps 1-4 of ProcessStereo as one XLA graph."""
    new_state, out = track_and_triangulate(
        tracker_state, prev_left, cur_left, cur_right, fx_baseline, params.tracker
    )
    obs = out.observations

    fg = estimate_foreground_mask(
        cur_left, params.foreground_ksize, params.foreground_min_gradient
    )

    # Pairwise gating.
    alive = obs.valid & (obs.disparities > 0)
    pts = obs.pixels
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    near = d2 <= params.neighbor_radius_px**2
    depth = fx_baseline / jnp.maximum(obs.disparities, 1e-3)
    depth_ok = jnp.abs(depth[:, None] - depth[None, :]) <= params.edge_max_depth_change

    # Foreground fraction along each segment (S samples per K^2 pair — the
    # mesher's gather hot spot). fg_downsample > 1 box-averages the mask and
    # samples nearest-neighbor: 8x fewer gather corners for a gate that is a
    # heuristic anyway (reference samples the full-res mask; set
    # fg_downsample=1 for that exact behavior).
    S = params.edge_samples
    ts = jnp.linspace(0.0, 1.0, S)
    seg = pts[:, None, None, :] * (1 - ts)[None, None, :, None] + pts[None, :, None, :] * ts[None, None, :, None]
    f = params.fg_downsample
    if f > 1:
        Hf, Wf = fg.shape[0] // f, fg.shape[1] // f
        fg_small = jnp.mean(
            fg[: Hf * f, : Wf * f].astype(jnp.float32).reshape(Hf, f, Wf, f),
            axis=(1, 3),
        )
        yy = jnp.clip((seg[..., 1] / f).astype(jnp.int32), 0, Hf - 1)
        xx = jnp.clip((seg[..., 0] / f).astype(jnp.int32), 0, Wf - 1)
        if params.edge_gate_impl == "onehot":
            fg_frac = _edge_fg_frac_onehot(
                fg_small, pts, yy, xx, f, params.neighbor_radius_px
            )
        else:
            fg_frac = jnp.mean(fg_small[yy, xx], axis=-1)
    else:
        fg_f = fg.astype(jnp.float32)
        fg_frac = jnp.mean(
            bilinear_sample(fg_f, seg[..., 1], seg[..., 0]), axis=-1
        )
    fg_ok = fg_frac >= params.edge_min_foreground_percent

    pair_valid = near & alive[:, None] & alive[None, :]
    observed = depth_ok & fg_ok

    max_weight = params.min_obs_connect_edge + params.min_obs_disconnect_edge
    graph = update_graph(graph, obs.lmk_ids, observed, pair_valid, max_weight)
    labels = get_cluster_labels(graph, alive, params.min_obs_connect_edge)
    sizes = cluster_sizes(labels)

    return new_state, graph, MesherDeviceOutput(
        labels=labels,
        sizes=sizes,
        pixels=pts,
        disparities=obs.disparities,
        alive=alive,
        foreground=fg,
        is_keyframe=out.is_keyframe,
    )


@dataclasses.dataclass
class ObjectMesherParams:
    device: ObjectMesherDeviceParams = dataclasses.field(
        default_factory=ObjectMesherDeviceParams
    )
    vertex_min_obs: int = 3          # min cluster size to mesh
    disparity_scale: float = 1.0     # if mesher ran on downscaled images


@functools.lru_cache(maxsize=32)
def _mesher_step_fn(params: ObjectMesherDeviceParams):
    """One compiled program per (hashable) device-params value, shared by
    every ObjectMesher instance; fx*baseline rides as a runtime argument."""
    return jax.jit(
        lambda ts, g, pl, cl, cr, fxb: mesher_device_step(
            ts, g, pl, cl, cr, fxb, params
        )
    )


class ObjectMesher:
    """Host wrapper: device step + per-cluster Delaunay backprojection."""

    def __init__(self, params: ObjectMesherParams, rig: StereoCamera):
        self.params = params
        self.rig = rig
        self.tracker_state = StereoTrackerState.create(params.device.tracker)
        self.graph = LandmarkGraph.create(params.device.tracker.capacity)
        self._prev_left: Optional[jnp.ndarray] = None
        self._fxb = jnp.asarray(float(rig.fx) * float(rig.baseline), jnp.float32)
        # Cached across instances: a per-instance closure would pay the
        # ~1-5 min remote compile on every node restart / rig (fxb is a
        # runtime argument, so one program serves all rigs).
        self._step = _mesher_step_fn(params.device)

    def process_stereo(self, left, right) -> TriangleMesh:
        left = jnp.asarray(left, jnp.float32)
        right = jnp.asarray(right, jnp.float32)
        prev = self._prev_left if self._prev_left is not None else left
        self.tracker_state, self.graph, out = self._step(
            self.tracker_state, self.graph, prev, left, right, self._fxb
        )
        self._prev_left = left
        return self._build_meshes(out)

    def _build_meshes(self, out: MesherDeviceOutput) -> TriangleMesh:
        return build_meshes(
            out, self.rig, self.params.disparity_scale, self.params.vertex_min_obs
        )


def build_meshes(
    out: MesherDeviceOutput,
    rig: StereoCamera,
    disparity_scale: float = 1.0,
    vertex_min_obs: int = 3,
) -> TriangleMesh:
    """Step 5 of ProcessStereo on the host: per-cluster Delaunay +
    backprojection. Module-level so batched consumers (the farm perception
    node) can run it per camera on sliced MesherDeviceOutput leaves."""
    from scipy.spatial import Delaunay, QhullError  # host-side

    labels = np.asarray(out.labels)
    pixels = np.asarray(out.pixels)
    disps = np.asarray(out.disparities) * disparity_scale
    alive = np.asarray(out.alive)

    meshes: List[TriangleMesh] = []
    for root in np.unique(labels[labels >= 0]):
        members = np.where((labels == root) & alive)[0]
        if len(members) < max(3, vertex_min_obs):
            continue
        pts2d = pixels[members]
        try:
            tri = Delaunay(pts2d)
        except QhullError:
            continue
        depth = float(rig.fx) * float(rig.baseline) / np.maximum(
            disps[members], 1e-3
        )
        verts = np.asarray(
            rig.left.backproject(jnp.asarray(pts2d), jnp.asarray(depth))
        )
        meshes.append(TriangleMesh(verts, tri.simplices.astype(np.int32)))
    return TriangleMesh.merge(meshes)

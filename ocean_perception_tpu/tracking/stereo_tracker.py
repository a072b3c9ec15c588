"""StereoTracker: the front-end state machine as a pure jitted function.

Reference parity: ft/StereoTracker::TrackAndTriangulate
(stereo_tracker.cpp:31-199):
1. re-track live landmarks with pyramidal LK (bidirectional check),
2. keyframe trigger = forced ∨ live < trigger_keyframe_min_lmks ∨
   frames since last keyframe >= trigger_keyframe_k,
3. on keyframes detect new features masked around live tracks,
4. stereo-match all live landmarks along epipolar stripes,
5. depth-gate observations (disparity below DepthToDisp(stereo_max_depth)
   dropped), kill landmarks missed for retrack_frames_k frames.

TPU design: the whole step is one jit-compiled function over a fixed-slot
TrackTable; detection/matching always execute (static graph) and their
results are masked in on keyframes.

k-ago re-tracking: when the state carries a pyramid RING (create with
``image_shape``), each lost landmark is re-tracked from the frame it was
LAST SEEN in — its true template — exactly like the reference's image ring
buffer (stereo_tracker.cpp:33-88), at the cost of one per-point ring index
in the LK template slice. Without a ring, the fallback re-tracks from the
last-seen pixel against the current frame only (weaker under fast motion).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.image import image_pyramid
from .detector import DetectorParams, detect_features
from .lk import LKParams, track_points, track_points_ring
from .stripe_match import StripeMatcherParams, match_rectified
from .tracks import LandmarkObservation, TrackTable


@struct.dataclass
class StereoTrackerParams:
    capacity: int = struct.field(pytree_node=False, default=200)
    retrack_frames_k: int = struct.field(pytree_node=False, default=3)
    trigger_keyframe_min_lmks: int = struct.field(pytree_node=False, default=10)
    trigger_keyframe_k: int = struct.field(pytree_node=False, default=5)
    stereo_max_depth: float = struct.field(pytree_node=False, default=20.0)
    stereo_min_depth: float = struct.field(pytree_node=False, default=0.2)
    detector: DetectorParams = struct.field(pytree_node=False, default=DetectorParams())
    lk: LKParams = struct.field(pytree_node=False, default=LKParams())
    matcher: StripeMatcherParams = struct.field(pytree_node=False, default=StripeMatcherParams())


@struct.dataclass
class StereoTrackerState:
    table: TrackTable
    frame_idx: jnp.ndarray      # int32 scalar
    last_kf_frame: jnp.ndarray  # int32 scalar
    next_lmk_id: jnp.ndarray    # int32 scalar
    # Past-frame pyramid ring for k-ago re-tracking: tuple of
    # (retrack_frames_k+1, Hl, Wl) level arrays, slot 0 = newest past frame.
    # None = legacy single-prev-image tracking.
    ring: Optional[Tuple[jnp.ndarray, ...]] = None

    @classmethod
    def create(
        cls,
        params: StereoTrackerParams,
        image_shape: Optional[Tuple[int, int]] = None,
    ) -> "StereoTrackerState":
        ring = None
        if image_shape is not None:
            Rk = params.retrack_frames_k + 1
            levels = params.lk.max_level + 1
            H, W = image_shape
            shapes = []
            h, w = H, W
            for _ in range(levels):
                shapes.append((h, w))
                h, w = (h + 1) // 2, (w + 1) // 2
            ring = tuple(jnp.zeros((Rk, hl, wl), jnp.float32) for hl, wl in shapes)
        return cls(
            table=TrackTable.create(params.capacity),
            frame_idx=jnp.asarray(0, jnp.int32),
            last_kf_frame=jnp.asarray(-(10**6), jnp.int32),
            next_lmk_id=jnp.asarray(0, jnp.int32),
            ring=ring,
        )


class TrackerOutput(NamedTuple):
    observations: LandmarkObservation
    is_keyframe: jnp.ndarray   # bool scalar
    n_tracked: jnp.ndarray     # landmarks successfully tracked this frame


def _fill_free_slots(table: TrackTable, det_pts, det_valid, next_id):
    """Assign detections to free slots (rank-matched scatter, static shapes)."""
    K = table.capacity
    alive = table.alive
    # Free slots ordered first.
    free_order = jnp.argsort(alive.astype(jnp.int32), stable=True)  # free slots first
    n_free = K - jnp.sum(alive.astype(jnp.int32))
    det_rank = jnp.cumsum(det_valid.astype(jnp.int32)) - 1          # rank among valid dets
    take = det_valid & (det_rank < n_free)
    target_slot = jnp.where(take, free_order[jnp.clip(det_rank, 0, K - 1)], K).astype(jnp.int32)

    new_ids = (next_id + det_rank).astype(jnp.int32)
    ids = table.ids.at[target_slot].set(jnp.where(take, new_ids, 0), mode="drop")
    pixels = table.pixels.at[target_slot].set(det_pts, mode="drop")
    kf_pixels = table.kf_pixels.at[target_slot].set(det_pts, mode="drop")
    zeros_i = jnp.zeros_like(det_rank)
    ages = table.ages.at[target_slot].set(zeros_i, mode="drop")
    missed = table.missed.at[target_slot].set(zeros_i, mode="drop")
    disp = table.disparities.at[target_slot].set(jnp.full_like(det_rank, -1.0, dtype=jnp.float32), mode="drop")
    kf_disp = table.kf_disparities.at[target_slot].set(jnp.full_like(det_rank, -1.0, dtype=jnp.float32), mode="drop")
    n_added = jnp.sum(take.astype(jnp.int32))
    new_table = table.replace(
        ids=ids, pixels=pixels, kf_pixels=kf_pixels, ages=ages,
        missed=missed, disparities=disp, kf_disparities=kf_disp,
    )
    return new_table, next_id + n_added


def track_and_triangulate(
    state: StereoTrackerState,
    prev_left: jnp.ndarray,
    cur_left: jnp.ndarray,
    cur_right: jnp.ndarray,
    rig_fx_baseline: jnp.ndarray,   # fx * baseline (for depth gating)
    params: StereoTrackerParams,
    force_keyframe: bool | jnp.ndarray = False,
) -> Tuple[StereoTrackerState, TrackerOutput]:
    """One front-end step. All shapes static; jit/scan safe."""
    table = state.table
    alive = table.alive

    # 1. Re-track live landmarks. With a ring, each landmark's template
    # comes from its LAST-SEEN frame (ring slot = missed count); without,
    # from the previous frame only.
    if state.ring is not None:
        cur_pyr = tuple(image_pyramid(cur_left, params.lk.max_level + 1))
        flow = track_points_ring(
            state.ring, cur_pyr, table.pixels, alive, table.missed, params.lk
        )
    else:
        flow = track_points(prev_left, cur_left, table.pixels, alive, params.lk)
    tracked = flow.status & alive
    pixels = jnp.where(tracked[:, None], flow.points, table.pixels)
    missed = jnp.where(tracked, 0, table.missed + 1)

    # Kill landmarks missed too long (KillOffLostLandmarks).
    keep = alive & (missed <= params.retrack_frames_k)
    ids = jnp.where(keep, table.ids, -1)
    ages = jnp.where(keep, table.ages + 1, 0)

    table = table.replace(ids=ids, pixels=pixels, missed=jnp.where(keep, missed, 0), ages=ages)
    n_tracked = jnp.sum((tracked & keep).astype(jnp.int32))

    # 2. Keyframe decision.
    is_kf = (
        jnp.asarray(force_keyframe)
        | (n_tracked < params.trigger_keyframe_min_lmks)
        | (state.frame_idx - state.last_kf_frame >= params.trigger_keyframe_k)
    )

    # 3. Detect new features (applied only on keyframes).
    det = detect_features(cur_left, params.detector, table.pixels, table.alive)
    kf_table, kf_next_id = _fill_free_slots(table, det.points, det.valid, state.next_lmk_id)
    table = jax.tree_util.tree_map(
        lambda kf, no: jnp.where(
            jnp.reshape(is_kf, (1,) * no.ndim), kf, no
        ),
        kf_table,
        table,
    )
    next_id = jnp.where(is_kf, kf_next_id, state.next_lmk_id)

    # 4. Stereo match all live landmarks on the current pair.
    matches = match_rectified(cur_left, cur_right, table.pixels, table.alive, params.matcher)
    # Depth gate: disparity below DepthToDisp(max_depth) means too far
    # (stereo_tracker.cpp:115-118); above DepthToDisp(min_depth) too close.
    min_disp = rig_fx_baseline / params.stereo_max_depth
    max_disp_gate = rig_fx_baseline / params.stereo_min_depth
    disp_ok = (matches.disparity > min_disp) & (matches.disparity < max_disp_gate)
    disparities = jnp.where(disp_ok, matches.disparity, -1.0)
    table = table.replace(disparities=disparities)

    # 5. Keyframe bookkeeping: snapshot pixel/disparity for VO correspondences.
    kf_pixels = jnp.where(jnp.reshape(is_kf, (1, 1)), table.pixels, table.kf_pixels)
    kf_disp = jnp.where(is_kf, disparities, table.kf_disparities)
    table = table.replace(kf_pixels=kf_pixels, kf_disparities=kf_disp)

    # Advance the ring: current frame becomes slot 0 for the next step.
    new_ring = state.ring
    if state.ring is not None:
        new_ring = tuple(
            jnp.concatenate([cur[None], lvl[:-1]], axis=0)
            for cur, lvl in zip(cur_pyr, state.ring)
        )

    new_state = StereoTrackerState(
        table=table,
        frame_idx=state.frame_idx + 1,
        last_kf_frame=jnp.where(is_kf, state.frame_idx, state.last_kf_frame),
        next_lmk_id=next_id,
        ring=new_ring,
    )
    out = TrackerOutput(
        observations=LandmarkObservation(
            lmk_ids=table.ids,
            pixels=table.pixels,
            disparities=table.disparities,
            valid=table.alive,
        ),
        is_keyframe=is_kf,
        n_tracked=n_tracked,
    )
    return new_state, out

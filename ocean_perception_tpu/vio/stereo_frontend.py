"""Stereo VO front-end: tracker + LM odometry → VoResult.

Reference parity: vio/stereo_frontend.{hpp,cpp} — wraps StereoTracker, builds
3D(previous keyframe)↔2D(current) correspondences from tracked landmarks
whose keyframe observation had a stereo match, optimizes the relative pose,
and reports a status bitmask (stereo_frontend.hpp:51-57):
  FEW_DETECTED_FEATURES | ODOM_ESTIMATION_FAILED | NO_FEATURES_FROM_LAST_KF.

The device step is pure; the host-side ``StereoFrontend`` class mirrors the
reference's stateful API around it.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.cameras import StereoCamera
from ..tracking.stereo_tracker import (
    StereoTrackerParams,
    StereoTrackerState,
    track_and_triangulate,
)
from .odometry import OdometryParams, OdometryResult, optimize_odometry


class FrontendStatus(enum.IntFlag):
    OK = 0
    FEW_DETECTED_FEATURES = 1
    ODOM_ESTIMATION_FAILED = 2
    NO_FEATURES_FROM_LAST_KF = 4


@struct.dataclass
class FrontendParams:
    tracker: StereoTrackerParams = struct.field(pytree_node=False, default=StereoTrackerParams())
    odometry: OdometryParams = struct.field(pytree_node=False, default=OdometryParams())
    pixel_sigma: float = struct.field(pytree_node=False, default=2.0)
    min_features: int = struct.field(pytree_node=False, default=8)
    # Odometry acceptance gate on mean whitened reprojection residual
    # (stereo_frontend.cpp:149, default 5.0 sigmas).
    max_avg_reprojection_error: float = struct.field(pytree_node=False, default=5.0)


class VoResult(NamedTuple):
    """Relative pose between the last keyframe and this frame (vo_result.hpp)."""

    T_prev_cur: jnp.ndarray   # (4, 4) cam_prevKF_T_cam_cur
    covariance: jnp.ndarray   # (6, 6)
    is_keyframe: jnp.ndarray
    status: jnp.ndarray       # int32 bitmask
    n_tracked: jnp.ndarray
    n_inliers: jnp.ndarray
    avg_reprojection_err: jnp.ndarray
    lmk_ids: jnp.ndarray      # (K,) observations for the smoother
    lmk_pixels: jnp.ndarray   # (K, 2)
    lmk_disparities: jnp.ndarray  # (K,)
    lmk_valid: jnp.ndarray    # (K,)


def frontend_step(
    state: StereoTrackerState,
    prev_left: jnp.ndarray,
    cur_left: jnp.ndarray,
    cur_right: jnp.ndarray,
    rig: StereoCamera,
    params: FrontendParams,
    force_keyframe=False,
) -> Tuple[StereoTrackerState, VoResult]:
    """Track + solve odometry in one jittable step."""
    fxb = rig.fx * rig.baseline
    prev_table = state.table  # keyframe snapshot BEFORE this step's update
    new_state, out = track_and_triangulate(
        state, prev_left, cur_left, cur_right, fxb, params.tracker, force_keyframe
    )
    table = new_state.table

    # Correspondences: landmarks observed (with disparity) at the LAST
    # keyframe (pre-update snapshot — on keyframe steps the table already
    # re-snapshotted to the current frame, which would yield identity VO)
    # tracked into the current frame. Slot identity must hold across the step.
    same_lmk = (prev_table.ids == table.ids) & (prev_table.ids >= 0)
    has_kf_3d = same_lmk & table.alive & (prev_table.kf_disparities > 0) & (table.missed == 0)
    depth_kf = fxb / jnp.maximum(prev_table.kf_disparities, 1e-3)
    P0 = rig.left.backproject(prev_table.kf_pixels, depth_kf)  # (K, 3) prev-KF cam
    sigmas = jnp.full(table.capacity, params.pixel_sigma, P0.dtype)

    odo = optimize_odometry(
        P0, table.pixels, sigmas, has_kf_3d, rig, params=params.odometry
    )

    n_corr = jnp.sum(has_kf_3d.astype(jnp.int32))
    status = jnp.zeros((), jnp.int32)
    status = status | jnp.where(out.n_tracked < params.min_features, FrontendStatus.FEW_DETECTED_FEATURES.value, 0)
    odom_failed = ~odo.success | (odo.error > params.max_avg_reprojection_error)
    status = status | jnp.where(odom_failed, FrontendStatus.ODOM_ESTIMATION_FAILED.value, 0)
    status = status | jnp.where(n_corr == 0, FrontendStatus.NO_FEATURES_FROM_LAST_KF.value, 0)

    # T_prev_cur = inverse of the estimated T_10 (frame0 = prev KF in cam
    # coords, frame1 = current).
    from ..core.se3 import se3_inverse

    vo = VoResult(
        T_prev_cur=se3_inverse(odo.T_10),
        covariance=odo.covariance,
        is_keyframe=out.is_keyframe,
        status=status,
        n_tracked=out.n_tracked,
        n_inliers=odo.n_inliers,
        avg_reprojection_err=odo.error,
        lmk_ids=out.observations.lmk_ids,
        lmk_pixels=out.observations.pixels,
        lmk_disparities=out.observations.disparities,
        lmk_valid=out.observations.valid,
    )
    return new_state, vo


class StereoFrontend:
    """Host-side stateful wrapper (reference StereoFrontend class API)."""

    def __init__(self, params: FrontendParams, rig: StereoCamera):
        self.params = params
        self.rig = rig
        # The rig knows the image size, so the tracker gets a pyramid ring
        # for true k-ago re-tracking (stereo_tracker.cpp:33-88 parity).
        self.state = StereoTrackerState.create(
            params.tracker, image_shape=(int(rig.left.height), int(rig.left.width))
        )
        self._prev_left: Optional[jnp.ndarray] = None
        self._step = jax.jit(
            lambda s, pl, cl, cr, f: frontend_step(s, pl, cl, cr, rig, params, f)
        )

    def track(self, left, right, force_keyframe: bool = False) -> VoResult:
        left = jnp.asarray(left, jnp.float32)
        right = jnp.asarray(right, jnp.float32)
        prev = self._prev_left if self._prev_left is not None else left
        self.state, vo = self._step(self.state, prev, left, right, force_keyframe or self._prev_left is None)
        self._prev_left = left
        return vo

#!/usr/bin/env python
"""AprilTag fiducial localization demo: a camera arcs over a 4-tag board,
every frame is ray-cast, detected, and localized with
`tracking.apriltags.estimate_camera_pose` (multi-tag Cauchy-LM refinement on
all detected corners — the same solver as the VIO odometry). Prints the
per-frame and aggregate pose error vs the ground-truth trajectory.

This is the relocalization capability the reference's vendored AprilTags
library (src/external/apriltags) was intended for but never wired into the
vehicle code (SURVEY.md §2.3).

Usage: python examples/apriltag_localization_demo.py [--frames 12] [--save PNG]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # host-side task; skip the TPU tunnel

import numpy as np

from ocean_perception_tpu.tracking.apriltags import (
    TagFamily,
    detect_tags,
    estimate_camera_pose,
    render_tag,
    tag_corners_world,
)

FX = FY = 600.0
CX, CY, H, W = 320.0, 240.0, 480, 640
TAG_SIZE = 0.19


def pose_rt(R, t):
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def rotm(ax, ang):
    c, s = np.cos(ang), np.sin(ang)
    if ax == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if ax == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def render_tag_view(fam, tag_id, s, R, t):
    """Ray-cast one tag plane (cam_T_tag = (R, t)) into the camera frame."""
    pat = render_tag(fam, tag_id, cell_px=1, white_border=2)
    ddc = pat.shape[0]
    cell_m = s / (fam.dim + 2)
    half = ddc / 2.0 * cell_m
    ys, xs = np.mgrid[0:H, 0:W]
    rays = np.stack([(xs - CX) / FX, (ys - CY) / FY, np.ones_like(xs, float)], -1)
    A = np.zeros((H, W, 3, 3))
    A[..., 0] = R[:, 0]
    A[..., 1] = R[:, 1]
    A[..., 2] = -rays
    uvl = np.linalg.solve(A, np.broadcast_to(-t, (H, W, 3))[..., None])[..., 0]
    u, v, lam = uvl[..., 0], uvl[..., 1], uvl[..., 2]
    px = (u + half) / cell_m
    py = (half - v) / cell_m
    inside = (px >= 0) & (px < ddc) & (py >= 0) & (py < ddc) & (lam > 0)
    return np.where(
        inside,
        pat[np.clip(py.astype(int), 0, ddc - 1), np.clip(px.astype(int), 0, ddc - 1)],
        1.0,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--noise", type=float, default=0.01)
    ap.add_argument("--save", default=None, help="save the first frame as PNG")
    args = ap.parse_args()

    fam = TagFamily.create("tag36h11")
    tags = {
        0: pose_rt(np.eye(3), [0.0, 0.0, 0.0]),
        7: pose_rt(np.eye(3), [0.55, 0.0, 0.0]),
        23: pose_rt(np.eye(3), [0.0, 0.45, 0.0]),
        42: pose_rt(np.eye(3), [0.55, 0.45, 0.0]),
    }
    rng = np.random.default_rng(0)

    errs_t, errs_r, n_tags = [], [], []
    for k in range(args.frames):
        a = (k / max(args.frames - 1, 1) - 0.5) * 0.5  # arc: -0.25..0.25 rad
        R = rotm("y", a) @ rotm("x", -0.06) @ np.diag([1.0, -1.0, -1.0])
        c = np.array([0.28 + 0.3 * np.sin(a), 0.22, 1.3 + 0.15 * np.cos(a)])
        cam_T_world = pose_rt(R, -R @ c)

        img = np.ones((H, W))
        for tid, wTt in tags.items():
            cTt = cam_T_world @ wTt
            img = np.minimum(img, render_tag_view(fam, tid, TAG_SIZE, cTt[:3, :3], cTt[:3, 3]))
        img = np.clip(img + rng.normal(0, args.noise, img.shape), 0, 1)
        if args.save and k == 0:
            from ocean_perception_tpu.utils.image_io import save_image

            save_image(args.save, img.astype(np.float32))

        dets = detect_tags(img, fam)
        out = estimate_camera_pose(dets, tags, TAG_SIZE, FX, FY, CX, CY)
        if out is None:
            print(f"frame {k:2d}: no known tags detected")
            continue
        world_T_cam, res = out
        err = np.linalg.inv(cam_T_world) @ np.linalg.inv(world_T_cam)
        et = float(np.linalg.norm(err[:3, 3]))
        er = float(np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)))
        errs_t.append(et)
        errs_r.append(er)
        n_tags.append(len(dets))
        print(
            f"frame {k:2d}: {len(dets)} tags, pose err {et * 1000:6.2f} mm / "
            f"{np.degrees(er):5.3f} deg (inliers {int(res.n_inliers)})"
        )

    if errs_t:
        print(
            f"\n{len(errs_t)}/{args.frames} frames localized | "
            f"median err {np.median(errs_t) * 1000:.2f} mm / "
            f"{np.degrees(np.median(errs_r)):.3f} deg | "
            f"worst {max(errs_t) * 1000:.2f} mm | "
            f"mean tags/frame {np.mean(n_tags):.1f}"
        )
        # Sanity: the demo is a regression harness too.
        assert np.median(errs_t) < 0.02, "median position error above 2 cm"
    else:
        raise SystemExit("no frames localized")


if __name__ == "__main__":
    main()

"""AprilTag fiducial detection tests (tracking/apriltags.py).

The reference vendors the MIT AprilTags detector (src/external/apriltags)
but ships no tests for it; these pin our original implementation with
rendered ground truth: family-table invariants, upright + rotated + warped
round-trips, multi-tag scenes, illumination/noise robustness, bit-error
recovery, and metric pose recovery through a synthetic pinhole camera.
"""

import numpy as np
import pytest

from ocean_perception_tpu.tracking.apriltags import (
    TagDetectorParams,
    TagFamily,
    _codes_to_grids,
    _grids_to_codes,
    detect_tags,
    render_tag,
    tag_pose,
)
from ocean_perception_tpu.tracking.tag_family_data import FAMILY_TABLES


# ---------------------------------------------------------------------------
# Family table invariants
# ---------------------------------------------------------------------------


def test_family_tables_shapes():
    # counts and first codes from the reference's vendored tables
    # (AprilTags/Tag36h11.h:51-62, Tag25h9.h, Tag16h5.h)
    assert len(FAMILY_TABLES["tag36h11"][3]) == 587
    assert int(FAMILY_TABLES["tag36h11"][3][0]) == 0xD5D628584
    assert len(FAMILY_TABLES["tag25h9"][3]) == 35
    assert len(FAMILY_TABLES["tag16h5"][3]) == 30


def test_grid_code_roundtrip():
    fam = TagFamily.create("tag36h11")
    grids = _codes_to_grids(fam.codes, fam.dim)
    assert np.array_equal(_grids_to_codes(grids), fam.codes)
    # MSB is the top-left cell
    g0 = _codes_to_grids(np.array([1 << 35], np.uint64), 6)[0]
    assert g0[0, 0] == 1 and g0.sum() == 1


@pytest.mark.parametrize("name", ["tag36h11", "tag25h9", "tag16h5"])
def test_min_hamming_over_rotations(name):
    """Pairwise (incl. rotated) hamming distance >= the family minimum —
    the property the families were generated for; also validates our
    rotation closure."""
    fam = TagFamily.create(name)
    codes = fam.codes[:40]  # bound runtime; 36h11 full table is 587x587x4
    pop8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)

    def pop(x):
        return pop8[x.view(np.uint8).reshape(*x.shape, 8)].sum(-1)

    for k in range(4):
        x = fam.rot_codes[k][:40, None] ^ codes[None, :]
        d = pop(x)
        if k == 0:
            d = d + np.eye(len(codes), dtype=int) * 99  # self-distance
        assert d.min() >= fam.min_hamming


def test_decode_exact_and_recovery():
    fam = TagFamily.create("tag36h11")
    code = int(fam.codes[123])
    assert fam.decode(code, 1)[:2] == (123, 0)
    flipped = code ^ (1 << 17)
    tid, ham, _ = fam.decode(flipped, 1)
    assert (tid, ham) == (123, 1)
    # over budget -> reject
    flipped3 = code ^ 0b111 << 9
    assert fam.decode(flipped3, 1)[0] == -1
    assert fam.decode(flipped3, 3)[0] == 123


# ---------------------------------------------------------------------------
# Rendered round-trips
# ---------------------------------------------------------------------------


def _place(canvas, tag, y0, x0):
    canvas[y0 : y0 + tag.shape[0], x0 : x0 + tag.shape[1]] = tag
    return canvas


def test_detect_upright_exact_corners():
    fam = TagFamily.create("tag36h11")
    img = _place(np.full((300, 400), 0.9, np.float32), render_tag(fam, 42, 12, 3), 60, 100)
    dets = detect_tags(img, fam)
    assert len(dets) == 1
    d = dets[0]
    assert (d.tag_id, d.hamming) == (42, 0)
    # black border outer square: x in [136-.5, 232-.5], y in [96-.5, 192-.5]
    expected = np.array(
        [[135.5, 191.5], [231.5, 191.5], [231.5, 95.5], [135.5, 95.5]]
    )  # [bl, br, tr, tl] in tag frame (y up)
    np.testing.assert_allclose(d.corners, expected, atol=0.1)
    np.testing.assert_allclose(d.center, [183.5, 143.5], atol=0.5)


def test_detect_all_four_rotations():
    """np.rot90 placements: id is recovered and the tag-frame corner order
    tracks the physical rotation exactly."""
    fam = TagFamily.create("tag36h11")
    img = _place(np.full((300, 400), 0.9, np.float32), render_tag(fam, 42, 12, 3), 60, 100)
    expected = np.array(
        [[135.5, 191.5], [231.5, 191.5], [231.5, 95.5], [135.5, 95.5]]
    )
    for k in range(4):
        dets = detect_tags(img, fam)
        assert len(dets) == 1 and dets[0].tag_id == 42
        pts = dets[0].corners.copy()
        # map detected corners back to the unrotated frame
        hh, ww = img.shape
        for _ in range(k):
            pts = np.stack([hh - 1 - pts[:, 1], pts[:, 0]], axis=1)
            hh, ww = ww, hh
        np.testing.assert_allclose(pts, expected, atol=0.1)
        img = np.rot90(img, 1).copy()


@pytest.mark.parametrize("name", ["tag25h9", "tag16h5"])
def test_other_families_roundtrip(name):
    fam = TagFamily.create(name)
    img = _place(np.full((260, 320), 0.85, np.float32), render_tag(fam, 3, 14, 3), 40, 80)
    dets = detect_tags(img, fam)
    assert len(dets) == 1
    assert (dets[0].tag_id, dets[0].hamming) == (3, 0)


def test_multiple_tags_one_image():
    fam = TagFamily.create("tag36h11")
    canvas = np.full((400, 640), 0.95, np.float32)
    _place(canvas, render_tag(fam, 5, 10, 2), 40, 60)
    _place(canvas, render_tag(fam, 77, 14, 2), 50, 320)
    _place(canvas, render_tag(fam, 300, 8, 2), 240, 150)
    dets = detect_tags(canvas, fam)
    assert sorted(d.tag_id for d in dets) == [5, 77, 300]
    assert all(d.hamming == 0 for d in dets)


def test_noise_and_illumination_gradient():
    fam = TagFamily.create("tag36h11")
    canvas = np.full((300, 400), 1.0, np.float32)
    _place(canvas, render_tag(fam, 11, 12, 3), 60, 100)
    # strong horizontal illumination falloff + sensor noise
    ramp = np.linspace(1.0, 0.45, 400, dtype=np.float32)[None, :]
    rng = np.random.default_rng(7)
    img = np.clip(canvas * ramp + rng.normal(0, 0.02, canvas.shape), 0, 1)
    dets = detect_tags(img.astype(np.float32), fam)
    assert len(dets) == 1 and dets[0].tag_id == 11


def test_single_bit_error_recovered():
    fam = TagFamily.create("tag36h11")
    tag = render_tag(fam, 9, cell_px=12, white_border=3)
    # corrupt one payload cell: payload cells start at (border+white)=5 cells in
    c0 = (3 + 1) * 12  # white border 3 + black border 1
    tag2 = tag.copy()
    tag2[c0 : c0 + 12, c0 : c0 + 12] = 1.0 - tag2[c0 + 6, c0 + 6]
    img = _place(np.full((300, 400), 0.9, np.float32), tag2, 60, 100)
    dets = detect_tags(img, fam, TagDetectorParams(max_hamming=1))
    assert len(dets) == 1
    assert dets[0].tag_id == 9 and dets[0].hamming == 1
    # and with a zero budget it must NOT be decoded
    assert detect_tags(img, fam, TagDetectorParams(max_hamming=0)) == []


def test_no_false_positives_on_texture():
    rng = np.random.default_rng(3)
    img = rng.random((240, 320)).astype(np.float32)
    # smooth it so it has dark blobs but no quads
    k = np.ones(7, np.float32) / 7
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)
    assert detect_tags(img, "tag36h11") == []


def test_edge_touching_tag_rejected():
    fam = TagFamily.create("tag36h11")
    tag = render_tag(fam, 2, 12, 0)  # no quiet zone
    img = _place(np.full((200, 300), 0.9, np.float32), tag, 0, 0)
    img = img[2:, 2:]  # black border bleeds to the image edge
    assert detect_tags(img, fam) == []


# ---------------------------------------------------------------------------
# Perspective warp + metric pose
# ---------------------------------------------------------------------------


def _rotm(ax, ang):
    c, s = np.cos(ang), np.sin(ang)
    if ax == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if ax == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _render_projected(fam, tag_id, s, R, t, fx, fy, cx, cy, H, W, noise=0.01):
    """Ray-cast the tag plane through a pinhole camera (front-facing pose:
    tag +z toward the camera)."""
    pat = render_tag(fam, tag_id, cell_px=1, white_border=2)
    ddc = pat.shape[0]
    cell_m = s / (fam.dim + 2)
    half = ddc / 2.0 * cell_m
    ys, xs = np.mgrid[0:H, 0:W]
    rays = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs, float)], -1)
    A = np.zeros((H, W, 3, 3))
    A[..., 0] = R[:, 0]
    A[..., 1] = R[:, 1]
    A[..., 2] = -rays
    uvl = np.linalg.solve(A, np.broadcast_to(-t, (H, W, 3))[..., None])[..., 0]
    u, v, lam = uvl[..., 0], uvl[..., 1], uvl[..., 2]
    px = (u + half) / cell_m
    py = (half - v) / cell_m
    inside = (px >= 0) & (px < ddc) & (py >= 0) & (py < ddc) & (lam > 0)
    img = np.where(
        inside,
        pat[np.clip(py.astype(int), 0, ddc - 1), np.clip(px.astype(int), 0, ddc - 1)],
        1.0,
    )
    rng = np.random.default_rng(0)
    return np.clip(img + rng.normal(0, noise, img.shape), 0, 1)


def test_perspective_detection_and_pose():
    fam = TagFamily.create("tag36h11")
    s = 0.16
    fx = fy = 600.0
    cx, cy, H, W = 320.0, 240.0, 480, 640
    R = (
        _rotm("x", np.deg2rad(25))
        @ _rotm("y", np.deg2rad(-15))
        @ _rotm("z", np.deg2rad(30))
        @ _rotm("x", np.pi)
    )
    t = np.array([0.03, -0.02, 0.7])
    img = _render_projected(fam, 7, s, R, t, fx, fy, cx, cy, H, W)
    dets = detect_tags(img, fam)
    assert len(dets) == 1
    d = dets[0]
    assert (d.tag_id, d.hamming) == (7, 0)

    ptag = np.array(
        [[-s / 2, -s / 2, 0], [s / 2, -s / 2, 0], [s / 2, s / 2, 0], [-s / 2, s / 2, 0]]
    )
    pc = (R @ ptag.T).T + t
    proj = np.stack([fx * pc[:, 0] / pc[:, 2] + cx, fy * pc[:, 1] / pc[:, 2] + cy], 1)
    assert np.abs(d.corners - proj).max() < 0.3  # subpixel corners

    T = tag_pose(d, s, fx, fy, cx, cy)
    assert np.abs(T[:3, :3] - R).max() < 5e-3
    assert np.abs(T[:3, 3] - t).max() < 5e-3


def test_pose_depth_scaling():
    """Pose distance scales correctly with apparent size."""
    fam = TagFamily.create("tag36h11")
    s = 0.2
    fx = fy = 500.0
    cx, cy, H, W = 320.0, 240.0, 480, 640
    R = _rotm("x", np.pi)  # fronto-parallel
    for z in (0.6, 1.2):
        t = np.array([0.0, 0.0, z])
        img = _render_projected(fam, 0, s, R, t, fx, fy, cx, cy, H, W, noise=0.0)
        dets = detect_tags(img, fam)
        assert len(dets) == 1
        T = tag_pose(dets[0], s, fx, fy, cx, cy)
        assert abs(T[2, 3] - z) < 0.01 * z


# ---------------------------------------------------------------------------
# Fiducial localization (estimate_camera_pose)
# ---------------------------------------------------------------------------

from ocean_perception_tpu.tracking.apriltags import (  # noqa: E402
    TagDetection,
    estimate_camera_pose,
    tag_corners_world,
)


def _board_world_tags(s):
    """Four identity-rotation tags on the z=0 world plane (tag z = world +z)."""
    return {
        0: _pose_rt(np.eye(3), [0.0, 0.0, 0.0]),
        7: _pose_rt(np.eye(3), [0.55, 0.0, 0.0]),
        23: _pose_rt(np.eye(3), [0.0, 0.45, 0.0]),
        42: _pose_rt(np.eye(3), [0.55, 0.45, 0.0]),
    }


def _pose_rt(R, t):
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def _board_camera(extra_rot=None):
    """Camera above the board looking down world -z, board upright in image."""
    R = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    if extra_rot is not None:
        R = extra_rot @ R
    c = np.array([0.28, 0.22, 1.4])
    cam_T_world = _pose_rt(R, -R @ c)
    return cam_T_world


def _project_w(cam_T_world, Pw, fx, fy, cx, cy):
    Pc = Pw @ cam_T_world[:3, :3].T + cam_T_world[:3, 3]
    return np.stack(
        [fx * Pc[:, 0] / Pc[:, 2] + cx, fy * Pc[:, 1] / Pc[:, 2] + cy], -1
    )


def test_tag_corners_world_order():
    s = 0.2
    world_T_tag = _pose_rt(np.eye(3), [1.0, 2.0, 3.0])
    P = tag_corners_world(world_T_tag, s)
    exp = np.array(
        [[0.9, 1.9, 3.0], [1.1, 1.9, 3.0], [1.1, 2.1, 3.0], [0.9, 2.1, 3.0]]
    )
    assert np.allclose(P, exp)


def test_estimate_camera_pose_exact_corners():
    """Exact projected corners -> pose recovered to mm/mrad (multi-tag LM)."""
    s, fx, fy, cx, cy = 0.19, 600.0, 600.0, 320.0, 240.0
    tags = _board_world_tags(s)
    cam_T_world = _board_camera(_rotm("y", 0.12) @ _rotm("x", -0.08))
    dets = []
    for tid, wTt in tags.items():
        corners = _project_w(cam_T_world, tag_corners_world(wTt, s), fx, fy, cx, cy)
        cTt = cam_T_world @ wTt
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        Hm = K @ np.stack(
            [cTt[:3, 0] * s / 2, cTt[:3, 1] * s / 2, cTt[:3, 3]], axis=1
        )
        dets.append(
            TagDetection(
                tag_id=tid, hamming=0, family="tag36h11",
                corners=corners, center=corners.mean(0), H=Hm / Hm[2, 2], code=0,
            )
        )
    out = estimate_camera_pose(dets, tags, s, fx, fy, cx, cy)
    assert out is not None
    world_T_cam, res = out
    assert bool(res.success)
    err = np.linalg.inv(cam_T_world) @ np.linalg.inv(world_T_cam)
    assert np.linalg.norm(err[:3, 3] - 0) < 2e-3
    assert np.abs(err[:3, :3] - np.eye(3)).max() < 2e-3


def test_estimate_camera_pose_unknown_tags_none():
    assert estimate_camera_pose([], {}, 0.2, 600, 600, 320, 240) is None


@pytest.mark.slow
def test_estimate_camera_pose_render_detect():
    """Full loop: ray-cast the 4-tag board, detect, localize the camera."""
    fam = TagFamily.create("tag36h11")
    s, fx, fy = 0.19, 600.0, 600.0
    cx, cy, H, W = 320.0, 240.0, 480, 640
    tags = _board_world_tags(s)
    cam_T_world = _board_camera(_rotm("y", 0.10) @ _rotm("x", -0.07))

    img = np.ones((H, W))
    for tid, wTt in tags.items():
        cTt = cam_T_world @ wTt
        tag_img = _render_projected(
            fam, tid, s, cTt[:3, :3], cTt[:3, 3], fx, fy, cx, cy, H, W, noise=0.0
        )
        img = np.minimum(img, tag_img)
    rng = np.random.default_rng(3)
    img = np.clip(img + rng.normal(0, 0.01, img.shape), 0, 1)

    dets = detect_tags(img, fam)
    assert len(dets) >= 3  # oblique view; at least 3 of 4 decode
    out = estimate_camera_pose(dets, tags, s, fx, fy, cx, cy)
    assert out is not None
    world_T_cam, res = out
    assert bool(res.success)
    err = np.linalg.inv(cam_T_world) @ np.linalg.inv(world_T_cam)
    assert np.linalg.norm(err[:3, 3]) < 0.02, err[:3, 3]
    assert np.abs(err[:3, :3] - np.eye(3)).max() < 0.02

"""Front-end tests: detector, LK flow, stripe matching, tracker state machine.

Goldens are synthetic: textured images with known planted corners and known
shifts (the reference's tests are visual; SURVEY.md §4 says numeric
thresholds must be invented)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.tracking import (
    DetectorParams,
    LKParams,
    StereoTrackerParams,
    StereoTrackerState,
    StripeMatcherParams,
    detect_features,
    match_rectified,
    track_and_triangulate,
    track_points,
)
from ocean_perception_tpu.tracking.detector import corner_score, mask_around_points

H, W = 120, 160


@pytest.fixture(scope="module")
def textured(rng=None):
    rng = np.random.default_rng(11)
    im = rng.random((H, W + 40)).astype(np.float32)
    im = cv2.GaussianBlur(im, (5, 5), 1.2) * 0.7 + 0.15
    return im


def checkerboard(h=H, w=W, square=12):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy // square) + (xx // square)) % 2).astype(np.float32)


def test_corner_score_peaks_on_corners():
    im = jnp.asarray(checkerboard())
    score = np.asarray(corner_score(im, DetectorParams()))
    # Corners of squares (multiples of 12) should outscore edges/flats.
    corner_vals = score[24, 24], score[36, 48], score[48, 96]
    flat_vals = score[6, 6], score[18, 30]
    assert min(corner_vals) > 10 * max(abs(v) for v in flat_vals)


def test_detect_features_parity_with_opencv(textured):
    """Our grid-bucketed GFTT should land near cv2.goodFeaturesToTrack corners."""
    im = textured[:, :W]
    det = detect_features(jnp.asarray(im), DetectorParams(max_features=48, min_distance=10, border=8))
    pts = np.asarray(det.points)[np.asarray(det.valid)]
    assert len(pts) >= 30
    ref = cv2.goodFeaturesToTrack(im, maxCorners=300, qualityLevel=0.01, minDistance=3, blockSize=9)
    ref = ref.reshape(-1, 2)
    d = np.linalg.norm(pts[:, None, :] - ref[None, :, :], axis=-1).min(axis=1)
    # Most of our detections coincide with OpenCV corners to a couple px.
    assert np.median(d) <= 2.0


def test_detect_features_respects_exclusion():
    im = jnp.asarray(checkerboard())
    p = DetectorParams(max_features=64, min_distance=10, border=4)
    excl_pts = jnp.asarray([[48.0, 48.0]])
    det = detect_features(im, p, excl_pts, jnp.asarray([True]))
    pts = np.asarray(det.points)[np.asarray(det.valid)]
    d = np.linalg.norm(pts - np.array([48.0, 48.0]), axis=1)
    assert d.min() > 8.0


def test_mask_around_points():
    m = np.asarray(mask_around_points((40, 40), jnp.asarray([[20.0, 10.0]]), jnp.asarray([True]), 5.0))
    assert m[10, 20] and m[14, 24] and not m[10, 30]


def test_lk_tracks_pure_translation(textured):
    shift = (3.6, 2.2)  # (dx, dy); warpAffine M is the FORWARD map by default
    prev = textured[:, :W]
    M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    nxt = cv2.warpAffine(textured, M, (textured.shape[1], textured.shape[0]))[:, :W]
    pts = np.stack(np.meshgrid(np.arange(30, W - 30, 20), np.arange(30, H - 30, 20)), -1).reshape(-1, 2).astype(np.float32)
    res = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), jnp.ones(len(pts), bool), LKParams())
    ok = np.asarray(res.status)
    assert ok.mean() > 0.8
    flow = np.asarray(res.points)[ok] - pts[ok]
    np.testing.assert_allclose(np.median(flow, axis=0), shift, atol=0.25)


def test_lk_corr_iters_matches_matmul_iters(textured):
    """corr_iters rewrites each LK iteration as an exact bilinear lookup of a
    precomputed correlation surface — identical math, different f32
    association order. Positions must agree to sub-centipixel on points both
    modes accept, with at most a marginal status flip or two."""
    prev = textured[:, :W]
    M = np.float32([[1, 0, 3.1], [0, 1, -1.7]])
    nxt = cv2.warpAffine(textured, M, (textured.shape[1], textured.shape[0]))[:, :W]
    pts = cv2.goodFeaturesToTrack(prev, maxCorners=120, qualityLevel=0.01, minDistance=7)
    pts = pts.reshape(-1, 2).astype(np.float32)
    valid = jnp.ones(len(pts), bool)
    r0 = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid, LKParams(corr_iters=False))
    r1 = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid, LKParams(corr_iters=True))
    s0, s1 = np.asarray(r0.status), np.asarray(r1.status)
    assert (s0 == s1).mean() >= 0.97  # convergence-path flips only
    both = s0 & s1
    assert both.sum() > 0.7 * len(pts)
    d = np.abs(np.asarray(r0.points) - np.asarray(r1.points))[both]
    assert d.max() < 0.05
    # And the mode is actually accurate, not just self-consistent.
    flow = np.asarray(r1.points)[s1] - pts[s1]
    np.testing.assert_allclose(np.median(flow, axis=0), (3.1, -1.7), atol=0.1)


def test_lk_exit_unroll_bit_identical(textured):
    """exit_unroll batches k masked body steps per while trip — converged/hit
    points are frozen by masking, so results must be BIT-identical to the
    one-step loop (max_iters=30 is divisible by 3)."""
    prev = textured[:, :W]
    M = np.float32([[1, 0, 2.3], [0, 1, 1.1]])
    nxt = cv2.warpAffine(textured, M, (textured.shape[1], textured.shape[0]))[:, :W]
    pts = cv2.goodFeaturesToTrack(prev, maxCorners=80, qualityLevel=0.01, minDistance=7)
    pts = pts.reshape(-1, 2).astype(np.float32)
    valid = jnp.ones(len(pts), bool)
    for corr in (False, True):
        r1 = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid,
                          LKParams(corr_iters=corr, exit_unroll=1))
        r3 = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid,
                          LKParams(corr_iters=corr, exit_unroll=3))
        np.testing.assert_array_equal(np.asarray(r1.points), np.asarray(r3.points))
        np.testing.assert_array_equal(np.asarray(r1.status), np.asarray(r3.status))


def test_lk_pallas_iterate_matches_xla(textured):
    """The Pallas per-level iteration kernel (interpret mode off-TPU) must
    reproduce the XLA corr-mode walk, including under a camera-axis vmap
    (the farm fleet shape)."""
    prev = textured[:, :W]
    M = np.float32([[1, 0, 2.7], [0, 1, -1.3]])
    nxt = cv2.warpAffine(textured, M, (textured.shape[1], textured.shape[0]))[:, :W]
    pts = cv2.goodFeaturesToTrack(prev, maxCorners=60, qualityLevel=0.01, minDistance=7)
    pts = pts.reshape(-1, 2).astype(np.float32)
    valid = jnp.ones(len(pts), bool)
    a = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid,
                     LKParams(corr_iters=True, pallas_iters=False))
    b = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid,
                     LKParams(pallas_iters=True))
    sa, sb = np.asarray(a.status), np.asarray(b.status)
    assert (sa == sb).mean() >= 0.97
    both = sa & sb
    assert both.sum() > 0.7 * len(pts)
    assert np.abs(np.asarray(a.points) - np.asarray(b.points))[both].max() < 0.01

    # Camera-axis vmap (fleet): batching the pallas_call must be identical
    # per camera.
    f = jax.vmap(lambda l, r: track_points(l, r, jnp.asarray(pts), valid,
                                           LKParams(pallas_iters=True)))
    out = f(jnp.stack([jnp.asarray(prev)] * 2), jnp.stack([jnp.asarray(nxt)] * 2))
    np.testing.assert_array_equal(np.asarray(out.points[0]), np.asarray(out.points[1]))
    # vs the unbatched run only to tolerance: vmap re-associates the f32
    # reductions in the XLA prep (batched einsum), not the kernel.
    sv = np.asarray(out.status[0])
    agree = sv & sb
    assert np.abs(np.asarray(out.points[0]) - np.asarray(b.points))[agree].max() < 0.01


def test_lk_bidirectional_rejects_bad(textured):
    prev = textured[:, :W]
    rng = np.random.default_rng(5)
    nxt = rng.random((H, W)).astype(np.float32)  # unrelated image
    pts = np.array([[40.0, 40.0], [80.0, 60.0]], np.float32)
    res = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), jnp.ones(2, bool), LKParams())
    assert not np.asarray(res.status).any()


def test_stripe_match_known_disparity(textured):
    d_true = 14
    # right(y, x - d) == left(y, x)  =>  right(y, u) = canvas(y, 20 + u + d).
    left = textured[:, 20 : 20 + W]
    right = textured[:, 20 + d_true : 20 + d_true + W]
    pts = np.stack(np.meshgrid(np.arange(40, W - 20, 15), np.arange(20, H - 20, 15)), -1).reshape(-1, 2).astype(np.float32)
    p = StripeMatcherParams(max_disp=32, templ_cols=15, templ_rows=11)
    res = match_rectified(jnp.asarray(left), jnp.asarray(right), jnp.asarray(pts), jnp.ones(len(pts), bool), p)
    d = np.asarray(res.disparity)
    matched = d >= 0
    assert matched.mean() > 0.8
    assert abs(np.median(d[matched]) - d_true) <= 1.0


def test_stripe_match_rejects_garbage(textured):
    left = textured[:, :W]
    rng = np.random.default_rng(6)
    right = rng.random((H, W)).astype(np.float32)
    pts = np.array([[80.0, 60.0], [100.0, 40.0]], np.float32)
    p = StripeMatcherParams(max_disp=32, templ_cols=15, templ_rows=11, max_matching_cost=0.1)
    res = match_rectified(jnp.asarray(left), jnp.asarray(right), jnp.asarray(pts), jnp.ones(2, bool), p)
    assert (np.asarray(res.disparity) < 0).all()


def _tracker_params():
    return StereoTrackerParams(
        capacity=64,
        detector=DetectorParams(max_features=64, min_distance=10, border=8),
        lk=LKParams(max_level=2),
        matcher=StripeMatcherParams(max_disp=24, templ_cols=15, templ_rows=11, max_matching_cost=0.3),
        trigger_keyframe_k=3,
    )


def test_stereo_tracker_end_to_end(textured):
    """Track a translating camera over a few frames; ids persist, disparities
    near truth, keyframes trigger on schedule."""
    d_true = 8
    params = _tracker_params()
    fxb = jnp.asarray(100.0)  # fx*baseline -> depth gates pass for d in (5, 500)

    def frame(shift):
        M = np.float32([[1, 0, -shift], [0, 1, 0]])
        l = cv2.warpAffine(textured, M, (textured.shape[1], textured.shape[0]))[:, :W]
        r = np.roll(l, -d_true, axis=1)
        return jnp.asarray(l), jnp.asarray(r)

    state = StereoTrackerState.create(params)
    step = jax.jit(lambda s, pl, cl, cr, f: track_and_triangulate(s, pl, cl, cr, fxb, params, f))

    prev_l, _ = frame(0.0)
    ids_by_frame = []
    for i, shift in enumerate([0.0, 1.5, 3.0, 4.5]):
        cur_l, cur_r = frame(shift)
        state, out = step(state, prev_l, cur_l, cur_r, i == 0)
        prev_l = cur_l
        obs = out.observations
        valid = np.asarray(obs.valid)
        ids_by_frame.append(set(np.asarray(obs.lmk_ids)[valid].tolist()))
        if i == 0:
            assert bool(out.is_keyframe)
            assert valid.sum() >= 20
        if i >= 1:
            assert int(out.n_tracked) >= 15
            d = np.asarray(obs.disparities)[valid]
            good = d[d > 0]
            assert len(good) > 10
            assert abs(np.median(good) - d_true) <= 1.0
    # Most landmark ids persist across consecutive frames.
    common = ids_by_frame[1] & ids_by_frame[2]
    assert len(common) >= 0.7 * len(ids_by_frame[1])


def test_tracker_keyframe_trigger(textured):
    params = _tracker_params()
    fxb = jnp.asarray(100.0)
    l = jnp.asarray(textured[:, :W])
    r = jnp.asarray(np.roll(textured[:, :W], -8, axis=1))
    state = StereoTrackerState.create(params)
    kfs = []
    for i in range(5):
        state, out = track_and_triangulate(state, l, l, r, fxb, params, i == 0)
        kfs.append(bool(out.is_keyframe))
    assert kfs[0]  # forced
    assert kfs[3]  # trigger_keyframe_k = 3


def test_lk_coarse_init_large_motion(textured):
    """Block-match initialization captures motions beyond the iterative
    walk's reach; failures reject cleanly instead of returning wrong flow."""
    import cv2 as _cv2

    rng = np.random.default_rng(11)
    h, w = 240, 320
    im = rng.random((h, w + 80)).astype(np.float32)
    im = _cv2.GaussianBlur(im, (5, 5), 1.2) * 0.7 + 0.15
    prev = im[:, :w]
    shift = 35.0
    M = np.float32([[1, 0, shift], [0, 1, 0]])
    nxt = _cv2.warpAffine(im, M, (im.shape[1], im.shape[0]))[:, :w]
    pts = np.stack(
        np.meshgrid(np.arange(80, w - 80, 25), np.arange(40, h - 40, 25)), -1
    ).reshape(-1, 2).astype(np.float32)
    res = track_points(
        jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts),
        jnp.ones(len(pts), bool), LKParams(max_level=3, coarse_init=True),
    )
    ok = np.asarray(res.status)
    assert ok.sum() >= 20
    flow = (np.asarray(res.points) - pts)[ok]
    assert np.median(np.abs(flow[:, 0] - shift)) < 0.5
    assert np.median(np.abs(flow[:, 1])) < 0.5


def test_k_ago_ring_recovers_occlusion_burst():
    """k-ago re-tracking (stereo_tracker.cpp:33-88 parity): after a fully
    corrupted frame (occlusion burst), landmarks must re-acquire from the
    frame they were LAST SEEN in. The ring recovers most tracks accurately;
    the legacy current-frame-only fallback loses them."""
    import cv2

    from ocean_perception_tpu.tracking.stereo_tracker import (
        StereoTrackerParams,
        StereoTrackerState,
        track_and_triangulate,
    )

    H, W = 120, 180
    rng = np.random.default_rng(7)
    canvas = cv2.GaussianBlur(rng.random((H, W + 80)).astype(np.float32), (5, 5), 1.0) * 0.8 + 0.1
    frames = [canvas[:, 10 + 3 * i : 10 + 3 * i + W] for i in range(5)]
    frames[2] = rng.random((H, W)).astype(np.float32)  # occlusion burst

    params = StereoTrackerParams(
        capacity=64, retrack_frames_k=3,
        detector=DetectorParams(max_features=64, min_distance=8, border=10),
        lk=LKParams(max_level=2),
        matcher=StripeMatcherParams(max_disp=16, templ_cols=11, templ_rows=7),
        trigger_keyframe_k=100, trigger_keyframe_min_lmks=0,
    )
    fxb = jnp.asarray(30.0)

    def run(use_ring):
        st = StereoTrackerState.create(params, image_shape=(H, W) if use_ring else None)
        prev = frames[0]
        ids_kf = pix_kf = None
        for i, im in enumerate(frames):
            st, _ = track_and_triangulate(
                st, jnp.asarray(prev), jnp.asarray(im), jnp.asarray(im),
                fxb, params, force_keyframe=(i == 0),
            )
            prev = im
            if i == 0:
                ids_kf = np.asarray(st.table.ids).copy()
                pix_kf = np.asarray(st.table.pixels).copy()
        alive = np.asarray(st.table.alive)
        ids = np.asarray(st.table.ids)
        pix = np.asarray(st.table.pixels)
        same = (ids == ids_kf) & alive & (ids >= 0)
        # Content moves -3 px/frame; truth after 4 frames = -12 px.
        err = np.abs(pix[same][:, 0] - (pix_kf[same][:, 0] - 12.0))
        return int(same.sum()), int((err < 1.5).sum())

    surv_ring, acc_ring = run(True)
    surv_leg, acc_leg = run(False)
    assert acc_ring > 0.7 * surv_ring, (acc_ring, surv_ring)
    assert acc_ring > 3 * max(acc_leg, 1), (acc_ring, acc_leg)


def test_detector_subpixel_refine():
    """Quadratic-fit subpixel corners (reference cornerSubPix option,
    feature_detector.cpp:88-123): localization beats integer detection on a
    corner rendered at a known subpixel position."""
    import cv2

    H, W = 64, 64
    true_x, true_y = 31.63, 32.28
    # An analytic Gaussian blob: its corner response is radially symmetric,
    # so the score peak sits exactly at the blob center.
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.exp(-(((xx - true_x) ** 2 + (yy - true_y) ** 2) / (2.0 * 2.5**2)))

    from ocean_perception_tpu.tracking.detector import detect_features

    errs = {}
    for sub in (False, True):
        det = detect_features(
            jnp.asarray(img),
            DetectorParams(max_features=4, min_distance=6, border=4, subpixel=sub),
        )
        pts = np.asarray(det.points)[np.asarray(det.valid)]
        d = np.sqrt(((pts - [true_x, true_y]) ** 2).sum(-1))
        errs[sub] = float(d.min())
    assert errs[True] <= errs[False] + 1e-6
    assert errs[True] < 0.45, errs


def test_lk_batched_windows_bit_identical(textured):
    """Batched one-hot window extraction (ops/windows.py) replaces the
    per-point dynamic_slice gathers with MXU 0/1 contractions. Every output
    element is 1*value + sum-of-0s, so the windows — and the full tracker
    output built on them — must be BIT-identical to the sliced path."""
    from ocean_perception_tpu.ops.image import image_pyramid
    from ocean_perception_tpu.ops.windows import extract_windows
    from ocean_perception_tpu.tracking.lk import track_points_ring

    rng = np.random.default_rng(3)
    # Direct extraction parity: plain image and ring with per-point source.
    img = jnp.asarray(rng.random((40, 56), dtype=np.float32))
    y0 = jnp.asarray(rng.integers(0, 40 - 9, 17), jnp.int32)
    x0 = jnp.asarray(rng.integers(0, 56 - 9, 17), jnp.int32)
    ref = jax.vmap(lambda y, x: jax.lax.dynamic_slice(img, (y, x), (9, 9)))(y0, x0)
    np.testing.assert_array_equal(
        np.asarray(extract_windows(img, y0, x0, 9)), np.asarray(ref)
    )
    ring = jnp.asarray(rng.random((3, 40, 56), dtype=np.float32))
    src = jnp.asarray(rng.integers(0, 3, 17), jnp.int32)
    ref_r = jax.vmap(
        lambda s, y, x: jax.lax.dynamic_slice(ring, (s, y, x), (1, 9, 9))[0]
    )(src, y0, x0)
    np.testing.assert_array_equal(
        np.asarray(extract_windows(ring, y0, x0, 9, src=src)), np.asarray(ref_r)
    )

    # Full tracker, plain pair.
    prev = textured[:, :W]
    M = np.float32([[1, 0, 2.7], [0, 1, -1.3]])
    nxt = cv2.warpAffine(textured, M, (textured.shape[1], textured.shape[0]))[:, :W]
    pts = cv2.goodFeaturesToTrack(prev, maxCorners=80, qualityLevel=0.01, minDistance=7)
    pts = pts.reshape(-1, 2).astype(np.float32)
    valid = jnp.ones(len(pts), bool)
    r0 = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid,
                      LKParams(batched_windows=False))
    r1 = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid,
                      LKParams(batched_windows=True))
    assert np.asarray(r0.status).sum() > 0.7 * len(pts)  # tracker actually works
    np.testing.assert_array_equal(np.asarray(r0.points), np.asarray(r1.points))
    np.testing.assert_array_equal(np.asarray(r0.status), np.asarray(r1.status))

    # Ring (k-ago) variant: each template from its own past frame; the
    # bidirectional pass also slices the SEARCH side from the ring.
    levels = LKParams().max_level + 1
    mid = jnp.asarray(0.5 * prev + 0.5 * nxt)
    ring_pyr = tuple(
        jnp.stack([a, b])
        for a, b in zip(image_pyramid(jnp.asarray(prev), levels),
                        image_pyramid(mid, levels))
    )
    next_pyr = image_pyramid(jnp.asarray(nxt), levels)
    src_k = jnp.asarray(rng.integers(0, 2, len(pts)), jnp.int32)
    rr0 = track_points_ring(ring_pyr, next_pyr, jnp.asarray(pts), valid, src_k,
                            LKParams(batched_windows=False))
    rr1 = track_points_ring(ring_pyr, next_pyr, jnp.asarray(pts), valid, src_k,
                            LKParams(batched_windows=True))
    assert np.asarray(rr0.status).sum() > 0.5 * len(pts)
    np.testing.assert_array_equal(np.asarray(rr0.points), np.asarray(rr1.points))
    np.testing.assert_array_equal(np.asarray(rr0.status), np.asarray(rr1.status))


def test_lk_batched_windows_camera_vmap(textured):
    """The fleet step runs the tracker under a camera-axis vmap; the batched
    extraction must stay bit-identical to the sliced path there too (the
    one-hot einsums gain a leading batch dim)."""
    rng = np.random.default_rng(7)
    prev = textured[:, :W]
    M = np.float32([[1, 0, 1.9], [0, 1, 0.8]])
    nxt = cv2.warpAffine(textured, M, (textured.shape[1], textured.shape[0]))[:, :W]
    pts = cv2.goodFeaturesToTrack(prev, maxCorners=40, qualityLevel=0.01, minDistance=7)
    pts = pts.reshape(-1, 2).astype(np.float32)
    B = 3
    prev_b = jnp.asarray(np.stack([prev + 0.01 * b for b in range(B)]))
    nxt_b = jnp.asarray(np.stack([nxt + 0.01 * b for b in range(B)]))
    pts_b = jnp.asarray(np.stack([pts + rng.normal(0, 0.3, pts.shape).astype(np.float32)
                                  for _ in range(B)]))
    valid = jnp.ones((B, len(pts)), bool)

    def run(bw):
        return jax.vmap(
            lambda p0, n0, k0, v0: track_points(p0, n0, k0, v0, LKParams(batched_windows=bw))
        )(prev_b, nxt_b, pts_b, valid)

    r0, r1 = run(False), run(True)
    assert np.asarray(r0.status).sum() > 0.6 * B * len(pts)
    np.testing.assert_array_equal(np.asarray(r0.points), np.asarray(r1.points))
    np.testing.assert_array_equal(np.asarray(r0.status), np.asarray(r1.status))


def test_lk_bwd_levels_gating_equivalence(textured):
    """Truncated backward verification (bwd_levels=2: offset-init fine-only
    walk + ZNCC appearance gate): the forward pass is untouched (positions
    bit-identical) and on this scene the cheap gate strictly DOMINATES the
    full 4-level backward — its only dropped full-accept is a 7.5 px wrong
    track (a full-gate false accept the ZNCC check catches), its 8 extra
    accepts are sub-0.05 px correct tracks the zero-motion-init coarse
    backward falsely rejected, and unrelated-image tracks are all
    rejected."""
    prev = textured[:, :W]
    shift = np.array([4.3, -2.6])
    M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    nxt = cv2.warpAffine(textured, M, (textured.shape[1], textured.shape[0]))[:, :W]
    pts = cv2.goodFeaturesToTrack(prev, maxCorners=120, qualityLevel=0.01, minDistance=7)
    pts = pts.reshape(-1, 2).astype(np.float32)
    valid = jnp.ones(len(pts), bool)
    full = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid, LKParams())
    trunc = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid, LKParams(bwd_levels=2))
    np.testing.assert_array_equal(np.asarray(full.points), np.asarray(trunc.points))
    s_full, s_trunc = np.asarray(full.status), np.asarray(trunc.status)
    assert s_full.sum() > 0.6 * len(pts)
    assert (s_full == s_trunc).mean() >= 0.90
    err = np.linalg.norm((np.asarray(trunc.points) - pts) - shift, axis=1)
    # Any full-gate accept the cheaper gate drops must be a WRONG track
    # (the ZNCC gate catching a full-gate false accept) — it never loses a
    # correct one on this scene.
    lost = s_full & ~s_trunc
    if lost.any():
        assert (err[lost] > 1.0).all()
    # The extra accepts are dominated by correct tracks (full-gate false
    # rejects: its zero-motion-init coarse levels diverge), and the overall
    # accepted set stays accurate.
    extra = ~s_full & s_trunc
    if extra.any():
        assert (err[extra] < 0.1).mean() >= 0.7
    assert np.median(err[s_trunc]) < 0.05
    assert (err[s_trunc] > 1.0).mean() < 0.05

    # The cheaper gate still rejects tracks into an unrelated image.
    rng = np.random.default_rng(5)
    noise = rng.random((H, W)).astype(np.float32)
    bad = track_points(
        jnp.asarray(prev), jnp.asarray(noise), jnp.asarray(pts[:8]),
        jnp.ones(8, bool), LKParams(bwd_levels=2),
    )
    assert not np.asarray(bad.status).any()


def test_lk_zncc_gate_drops_false_accepts(textured):
    """zncc_gate=True on top of the FULL backward check: pure round-trip
    geometry admits occasional wrong tracks whose backward walk happens to
    return near the origin; the appearance gate rejects exactly those while
    keeping the correct accepts."""
    prev = textured[:, :W]
    shift = np.array([4.3, -2.6])
    M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    nxt = cv2.warpAffine(textured, M, (textured.shape[1], textured.shape[0]))[:, :W]
    pts = cv2.goodFeaturesToTrack(prev, maxCorners=120, qualityLevel=0.01, minDistance=7)
    pts = pts.reshape(-1, 2).astype(np.float32)
    valid = jnp.ones(len(pts), bool)
    base = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid, LKParams())
    gated = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid, LKParams(zncc_gate=True))
    sb, sg = np.asarray(base.status), np.asarray(gated.status)
    np.testing.assert_array_equal(np.asarray(base.points), np.asarray(gated.points))
    # Strictly a subset of the base accepts (the gate only ANDs)...
    assert not (~sb & sg).any()
    err = np.linalg.norm((np.asarray(base.points) - pts) - shift, axis=1)
    dropped = sb & ~sg
    # ...every dropped track is a wrong one, and the base gate's wrong
    # accepts (>1 px) are all caught.
    if dropped.any():
        assert (err[dropped] > 1.0).all()
    assert not (err[sg] > 1.0).any()
    assert sg.sum() >= 0.95 * (err[sb] <= 1.0).sum()


def test_lk_bwd_levels_ring_variant(textured):
    """bwd_levels on the k-ago ring path (what the fleet runs): forward
    positions bit-identical to the full-backward ring track, gate mostly
    agrees, and accuracy holds for points sourced from BOTH ring slots."""
    from ocean_perception_tpu.ops.image import image_pyramid
    from ocean_perception_tpu.tracking.lk import track_points_ring

    levels = 3
    prev0 = textured[:, :W]            # slot 0: newest past frame
    prev1 = textured[:, 2 : W + 2]     # slot 1: older frame, shifted -2 px in x
    nxt = textured[:, 5 : W + 5]       # current frame: -5 px vs slot 0, -3 vs slot 1
    ring_pyr = tuple(
        jnp.stack([a, b])
        for a, b in zip(image_pyramid(jnp.asarray(prev0), levels),
                        image_pyramid(jnp.asarray(prev1), levels))
    )
    next_pyr = image_pyramid(jnp.asarray(nxt), levels)
    pts = np.stack(
        np.meshgrid(np.arange(30, W - 30, 17), np.arange(25, H - 25, 16)), -1
    ).reshape(-1, 2).astype(np.float32)
    src = np.arange(len(pts)) % 2
    valid = jnp.ones(len(pts), bool)

    full = track_points_ring(ring_pyr, next_pyr, jnp.asarray(pts), valid,
                             jnp.asarray(src), LKParams(max_level=levels - 1))
    trunc = track_points_ring(ring_pyr, next_pyr, jnp.asarray(pts), valid,
                              jnp.asarray(src), LKParams(max_level=levels - 1, bwd_levels=2))
    np.testing.assert_array_equal(np.asarray(full.points), np.asarray(trunc.points))
    sf, st = np.asarray(full.status), np.asarray(trunc.status)
    assert sf.sum() > 0.7 * len(pts)
    assert (sf == st).mean() >= 0.90
    # True flow depends on each point's source slot. nxt(u) = textured(u+5):
    # a slot-0 template textured(x) sits at u = x-5; a slot-1 template
    # textured(x+2) at u = x-3.
    true_dx = np.where(src == 0, -5.0, -3.0)
    err = np.abs((np.asarray(trunc.points)[:, 0] - pts[:, 0]) - true_dx)
    for s in (0, 1):
        sel = st & (src == s)
        assert sel.sum() > 5
        assert np.median(err[sel]) < 0.15


def test_lk_fused_matches_xla(textured):
    """The fused prep+walk kernel pair (round 5, ops/pallas/lk_prep.py) must
    reproduce the XLA corr-mode walk (its documented math), stay close to
    the production matmul walk, handle the k-ago ring, and be per-camera
    identical under the fleet's camera-axis vmap (sequential_vmap)."""
    prev = textured[:, :W]
    M = np.float32([[1, 0, 2.7], [0, 1, -1.3]])
    nxt = cv2.warpAffine(textured, M, (textured.shape[1], textured.shape[0]))[:, :W]
    pts = cv2.goodFeaturesToTrack(prev, maxCorners=60, qualityLevel=0.01, minDistance=7)
    pts = pts.reshape(-1, 2).astype(np.float32)
    valid = jnp.ones(len(pts), bool)
    a = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid,
                     LKParams(corr_iters=True, pallas_iters=False, fused_lk=False))
    b = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid,
                     LKParams(fused_lk=True))
    sa, sb = np.asarray(a.status), np.asarray(b.status)
    assert (sa == sb).mean() >= 0.97
    both = sa & sb
    assert both.sum() > 0.7 * len(pts)
    assert np.abs(np.asarray(a.points) - np.asarray(b.points))[both].max() < 0.01

    m = track_points(jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts), valid,
                     LKParams(fused_lk=False))
    sm = np.asarray(m.status)
    assert (sm == sb).mean() >= 0.97
    agree = sm & sb
    assert np.abs(np.asarray(m.points) - np.asarray(b.points))[agree].max() < 0.05

    # k-ago ring: template slices from per-point source frames.
    from ocean_perception_tpu.ops.image import image_pyramid
    from ocean_perception_tpu.tracking.lk import track_points_ring

    levels = LKParams().max_level + 1
    ring_pyr = tuple(
        jnp.stack([image_pyramid(jnp.asarray(prev), levels)[l]] * 3)
        for l in range(levels)
    )
    cur_pyr = tuple(image_pyramid(jnp.asarray(nxt), levels))
    src = jnp.asarray(np.arange(len(pts)) % 3, jnp.int32)
    rf = track_points_ring(ring_pyr, cur_pyr, jnp.asarray(pts), valid, src,
                           LKParams(fused_lk=True))
    rx = track_points_ring(ring_pyr, cur_pyr, jnp.asarray(pts), valid, src,
                           LKParams(corr_iters=True, pallas_iters=False, fused_lk=False))
    srf, srx = np.asarray(rf.status), np.asarray(rx.status)
    assert (srf == srx).mean() >= 0.97
    bb = srf & srx
    assert np.abs(np.asarray(rf.points) - np.asarray(rx.points))[bb].max() < 0.01

    # Camera-axis vmap (fleet): per-camera results identical to unbatched.
    f = jax.vmap(lambda l, r: track_points(l, r, jnp.asarray(pts), valid,
                                           LKParams(fused_lk=True)))
    out = f(jnp.stack([jnp.asarray(prev)] * 2), jnp.stack([jnp.asarray(nxt)] * 2))
    np.testing.assert_array_equal(np.asarray(out.points[0]), np.asarray(out.points[1]))
    # vs the unbatched run only to tolerance: vmap re-associates the f32
    # reductions in the XLA pyramid/pad prep, not the kernels.
    sv = np.asarray(out.status[0])
    agree2 = sv & sb
    assert np.abs(np.asarray(out.points[0]) - np.asarray(b.points))[agree2].max() < 0.01


def test_stripe_batched_matches_sliced(textured):
    """The gather-free stripe matcher (one-hot windows + static-shift
    correlation) must agree with the per-point sliced path: identical
    disparities, costs to f32-association tolerance — incl. borders and
    subpixel mode."""
    from ocean_perception_tpu.tracking.stripe_match import (
        StripeMatcherParams,
        match_rectified,
    )

    left = textured[:, 16:16 + W - 32]
    right = textured[:, 4:4 + W - 32]  # 12 px disparity
    rng = np.random.default_rng(7)
    K = 60
    pts = np.stack(
        [rng.uniform(0, left.shape[1] - 1, K), rng.uniform(0, H - 1, K)], 1
    ).astype(np.float32)
    pts[0] = [0, 0]
    pts[1] = [left.shape[1] - 1, H - 1]
    valid = jnp.ones(K, bool)
    for sub in (False, True):
        a = match_rectified(jnp.asarray(left), jnp.asarray(right), jnp.asarray(pts),
                            valid, StripeMatcherParams(max_disp=32, impl="sliced",
                                                       subpixel=sub))
        b = match_rectified(jnp.asarray(left), jnp.asarray(right), jnp.asarray(pts),
                            valid, StripeMatcherParams(max_disp=32, impl="batched",
                                                       subpixel=sub))
        np.testing.assert_allclose(np.asarray(a.cost), np.asarray(b.cost), atol=1e-5)
        d = np.abs(np.asarray(a.disparity) - np.asarray(b.disparity))
        assert (d < 1e-3).mean() >= 0.97  # argmin ties may flip on ulp noise

"""Flagship perception pipeline end-to-end test with ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.models.perception import PerceptionConfig, perception_step
from test_stereo import make_scene

H, W = 64, 96


def _rgbify(gray):
    tint = np.array([0.35, 0.75, 0.9], np.float32)
    return np.clip(gray[..., None] * tint + 0.05, 0, 1)


@pytest.mark.slow
def test_perception_step_recovers_disparity_and_depth():
    left, right, truth = make_scene(np.random.default_rng(9), h=H, w=W, d_fg=12.0, d_bg=3.0)
    cam = PinholeCamera.create(120.0, 120.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.3)
    cfg = PerceptionConfig(engine="patchmatch", max_disp=24, internal_scale=1, run_enhance=True)
    out = jax.jit(lambda l, r: perception_step(l, r, rig, cfg))(
        jnp.asarray(_rgbify(left)), jnp.asarray(_rgbify(right))
    )
    d = np.asarray(out.disparity)
    valid = (d > 0)
    valid[: 4] = valid[-4:] = False
    valid[:, :4] = valid[:, -4:] = False
    assert valid.mean() > 0.25
    err = np.abs(d - truth)[valid]
    assert np.median(err) < 1.0  # the BASELINE acceptance bound
    # Depth agrees with fx*b/d on the foreground block.
    fg = valid & (truth > 10)
    if fg.any():
        z = np.asarray(out.depth)[fg]
        z_true = 120.0 * 0.3 / truth[fg]
        assert np.median(np.abs(z - z_true)) < 0.4
    assert np.isfinite(np.asarray(out.enhanced_left)).all()


def test_perception_step_engines_agree_roughly():
    left, right, truth = make_scene(np.random.default_rng(5), h=H, w=W)
    cam = PinholeCamera.create(120.0, 120.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.3)
    results = {}
    for engine in ("wta", "sgm", "patchmatch"):
        cfg = PerceptionConfig(engine=engine, max_disp=24, internal_scale=1, run_enhance=False)
        out = perception_step(jnp.asarray(_rgbify(left)), jnp.asarray(_rgbify(right)), rig, cfg)
        results[engine] = np.asarray(out.disparity)
    for engine, d in results.items():
        valid = d > 0
        assert valid.mean() > 0.2, engine
        assert np.median(np.abs(d - truth)[valid]) < 1.5, engine


@pytest.mark.parametrize("scale", [2, 4])
def test_perception_step_internal_scale(scale):
    """The production (/2) and farm (/4) operating points: disparity solved
    on a pyramid level, upsampled and rescaled back to full resolution."""
    h, w, true_d = 128, 192, 8.0
    rng = np.random.default_rng(3)
    import cv2

    canvas = cv2.GaussianBlur(rng.random((h, w + 40)).astype(np.float32), (5, 5), 1.2)
    left = canvas[:, 20 : 20 + w]
    right = canvas[:, 20 + int(true_d) : 20 + int(true_d) + w]
    cam = PinholeCamera.create(120.0, 120.0, w / 2, h / 2, h, w)
    rig = StereoCamera.create(cam, cam, baseline=0.3)
    cfg = PerceptionConfig(
        engine="wta", max_disp=16, internal_scale=scale, run_enhance=False
    )
    out = perception_step(jnp.asarray(_rgbify(left)), jnp.asarray(_rgbify(right)), rig, cfg)
    d = np.asarray(out.disparity)
    assert d.shape == (h, w)
    valid = d > 0
    valid[:, : int(true_d) + scale] = False  # left occlusion band
    assert valid.mean() > 0.5
    # Solved at /scale then multiplied by scale: quantization is ±scale/2 px,
    # so the median must land within one coarse pixel of the truth.
    assert abs(np.median(d[valid]) - true_d) <= scale
    # Depth computed FROM the rescaled disparity (full-res fx): fx*b/d.
    z = np.asarray(out.depth)[valid & (np.abs(d - true_d) < 0.5)]
    if z.size:
        np.testing.assert_allclose(np.median(z), 120.0 * 0.3 / true_d, rtol=0.05)


def test_perception_step_rejects_non_pow2_scale():
    cam = PinholeCamera.create(120.0, 120.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.3)
    cfg = PerceptionConfig(engine="wta", max_disp=16, internal_scale=3)
    with pytest.raises(ValueError, match="power of two"):
        perception_step(jnp.zeros((H, W, 3)), jnp.zeros((H, W, 3)), rig, cfg)


@pytest.mark.slow
def test_full_frontend_step_single_graph():
    """enhance+disparity+tracking+graph in one jit; state threads across frames."""
    from ocean_perception_tpu.mesher import LandmarkGraph
    from ocean_perception_tpu.mesher.object_mesher import ObjectMesherDeviceParams
    from ocean_perception_tpu.models.perception import full_frontend_step
    from ocean_perception_tpu.tracking import DetectorParams, LKParams, StripeMatcherParams
    from ocean_perception_tpu.tracking.stereo_tracker import (
        StereoTrackerParams,
        StereoTrackerState,
    )

    left, right, truth = make_scene(np.random.default_rng(2), h=H, w=W)
    lrgb, rrgb = jnp.asarray(_rgbify(left)), jnp.asarray(_rgbify(right))
    cam = PinholeCamera.create(120.0, 120.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.3)
    cfg = PerceptionConfig(engine="wta", max_disp=24, internal_scale=1, run_enhance=True)
    mp = ObjectMesherDeviceParams(
        tracker=StereoTrackerParams(
            capacity=48,
            detector=DetectorParams(max_features=48, min_distance=8, border=6),
            lk=LKParams(max_level=1),
            matcher=StripeMatcherParams(max_disp=24, templ_cols=11, templ_rows=9, max_matching_cost=0.4),
        ),
        min_obs_connect_edge=2.0,
        min_obs_disconnect_edge=1.0,
    )
    state = StereoTrackerState.create(mp.tracker)
    graph = LandmarkGraph.create(mp.tracker.capacity)
    step = jax.jit(
        lambda s, g, pl, l, r: full_frontend_step(s, g, pl, l, r, rig, cfg, mp)
    )
    prev_gray = jnp.asarray(left)
    for _ in range(3):
        out, prev_gray = step(state, graph, prev_gray, lrgb, rrgb)
        state, graph = out.tracker_state, out.graph
    assert out.perception.disparity.shape == (H, W)
    assert int(np.asarray(out.mesher.alive).sum()) > 10
    assert np.isfinite(np.asarray(out.perception.enhanced_left)).all()

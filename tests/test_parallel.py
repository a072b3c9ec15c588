"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.models.perception import PerceptionConfig
from ocean_perception_tpu.parallel import camera_sharding, make_mesh, multi_camera_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
    return make_mesh(8, axis_names=("cam",))


def _inputs(n, H=64, W=96, seed=0):
    rng = np.random.default_rng(seed)
    canvas = rng.random((H, W + 32)).astype(np.float32)
    left = canvas[:, 16 : 16 + W]
    right = np.roll(canvas, 4, axis=1)[:, 16 : 16 + W]
    tint = np.array([0.35, 0.75, 0.9], np.float32)
    lf = np.clip(left[..., None] * tint + 0.05, 0, 1)
    rf = np.clip(right[..., None] * tint + 0.05, 0, 1)
    # Each camera gets a slightly different frame.
    bl = np.stack([np.clip(lf + i * 1e-3, 0, 1) for i in range(n)])
    br = np.stack([rf] * n)
    return jnp.asarray(bl), jnp.asarray(br)


def _rig(H=64, W=96):
    cam = PinholeCamera.create(80.0, 80.0, W / 2, H / 2, H, W)
    return StereoCamera.create(cam, cam, 0.12)


@pytest.mark.slow
def test_multi_camera_step_sharded(mesh):
    n_cams = 16
    bl, br = _inputs(n_cams)
    cfg = PerceptionConfig(engine="wta", max_disp=16, internal_scale=1, run_enhance=False)
    out, stats = multi_camera_step(bl, br, _rig(), cfg, mesh)
    assert out.disparity.shape == (n_cams, 64, 96)
    # Outputs carry the camera sharding.
    shard_axes = out.disparity.sharding.spec
    assert shard_axes[0] == "cam"
    # Fleet stats replicated scalar is the VALID-COUNT-WEIGHTED mean of the
    # per-camera means (a blind camera must not drag the fleet mean to 0).
    depth = np.asarray(out.depth)
    valid = depth > 0
    counts = valid.sum(axis=(1, 2))
    expect = (np.asarray(stats.mean_depth) * counts).sum() / max(counts.sum(), 1)
    np.testing.assert_allclose(float(stats.global_mean_depth), expect, rtol=1e-5)


@pytest.mark.slow
def test_sharded_patchmatch_matches_single_device():
    """One frame strip-sharded across 8 devices (halo exchange over the mesh)
    must reproduce the single-device engine with chunks_y = n_devices —
    exactly, away from the 1-row global-border stencil splice."""
    from jax.sharding import Mesh
    from ocean_perception_tpu.parallel.stereo_sharded import sharded_patchmatch
    from ocean_perception_tpu.stereo.patchmatch import (
        PatchMatchParams,
        patchmatch_disparity,
    )

    H, W, D = 160, 128, 24
    rng = np.random.default_rng(7)
    canvas = rng.random((H, W + 48)).astype(np.float32)
    import cv2

    canvas = cv2.GaussianBlur(canvas, (5, 5), 1.1)
    left = canvas[:, 16 : 16 + W]
    right = canvas[:, 16 + 6 : 16 + 6 + W]  # true disparity 6

    n = 8
    mesh8 = Mesh(np.array(jax.devices()[:n]), ("strip",))
    p = PatchMatchParams(
        max_disp=D, chunks=4, iters=2, right_wta=True, init_dilate_factor=3
    )
    res_sh = sharded_patchmatch(jnp.asarray(left), jnp.asarray(right), mesh8, p)

    res_1 = patchmatch_disparity(
        jnp.asarray(left), jnp.asarray(right), p.replace(chunks_y=n)
    )

    a, b = np.asarray(res_sh.left), np.asarray(res_1.left)
    # Interior: bit-identical.
    np.testing.assert_array_equal(a[1:-1], b[1:-1])
    # Border rows may differ only through the stencil-splice path; they must
    # still agree almost everywhere.
    assert (a == b).mean() > 0.999
    np.testing.assert_array_equal(
        np.asarray(res_sh.right)[1:-1], np.asarray(res_1.right)[1:-1]
    )
    # Sanity: the disparity is actually recovered.
    valid = a > 0
    assert valid.mean() > 0.3
    assert abs(np.median(a[valid]) - 6.0) <= 1.0


@pytest.mark.slow
def test_sharded_patchmatch_bf16_n4():
    """Production dtype (bf16 volume) through shard_map on a 4-device mesh:
    still recovers the scene and matches the single-device engine."""
    from jax.sharding import Mesh
    from ocean_perception_tpu.parallel.stereo_sharded import sharded_patchmatch
    from ocean_perception_tpu.stereo.patchmatch import (
        PatchMatchParams,
        patchmatch_disparity,
    )

    H, W, D = 120, 96, 16
    rng = np.random.default_rng(9)
    canvas = rng.random((H, W + 32)).astype(np.float32)
    import cv2

    canvas = cv2.GaussianBlur(canvas, (5, 5), 1.1)
    left = canvas[:, 8 : 8 + W]
    right = canvas[:, 8 + 5 : 8 + 5 + W]

    n = 4
    mesh4 = Mesh(np.array(jax.devices()[:n]), ("strip",))
    p = PatchMatchParams(
        max_disp=D, chunks=4, iters=2, right_wta=True,
        init_dilate_factor=3, volume_bf16=True,
    )
    res_sh = sharded_patchmatch(jnp.asarray(left), jnp.asarray(right), mesh4, p)
    res_1 = patchmatch_disparity(
        jnp.asarray(left), jnp.asarray(right), p.replace(chunks_y=n)
    )
    a, b = np.asarray(res_sh.left), np.asarray(res_1.left)
    assert (a == b).mean() > 0.99
    valid = a > 0
    assert valid.mean() > 0.3
    assert abs(np.median(a[valid]) - 5.0) <= 1.0


@pytest.mark.slow
def test_sharded_matches_single_device(mesh):
    """The sharded result must equal the unsharded computation."""
    n_cams = 8
    bl, br = _inputs(n_cams, seed=3)
    cfg = PerceptionConfig(engine="wta", max_disp=16, internal_scale=1, run_enhance=False)
    rig = _rig()
    out_sharded, _ = multi_camera_step(bl, br, rig, cfg, mesh)

    from ocean_perception_tpu.models.perception import perception_step

    out_single = jax.vmap(lambda l, r: perception_step(l, r, rig, cfg).disparity)(bl, br)
    np.testing.assert_allclose(np.asarray(out_sharded.disparity), np.asarray(out_single), atol=1e-5)


@pytest.mark.slow
def test_multi_camera_full_frontend_sharded(mesh):
    """The WHOLE frontend (enhance + disparity + tracking + landmark graph)
    under the camera axis: per-camera state pytrees thread across frames with
    every leaf sharded, and camera 0 reproduces the single-camera path."""
    from ocean_perception_tpu.mesher import LandmarkGraph
    from ocean_perception_tpu.mesher.object_mesher import ObjectMesherDeviceParams
    from ocean_perception_tpu.models.perception import full_frontend_step
    from ocean_perception_tpu.parallel import (
        create_fleet_frontend_state,
        multi_camera_frontend_step,
    )
    from ocean_perception_tpu.tracking import DetectorParams, LKParams, StripeMatcherParams
    from ocean_perception_tpu.tracking.stereo_tracker import (
        StereoTrackerParams,
        StereoTrackerState,
    )

    n_cams = 8
    H, W = 64, 96
    bl, br = _inputs(n_cams, H=H, W=W)
    rig = _rig(H, W)
    cfg = PerceptionConfig(engine="wta", max_disp=16, internal_scale=1, run_enhance=True)
    mp = ObjectMesherDeviceParams(
        tracker=StereoTrackerParams(
            capacity=32,
            detector=DetectorParams(max_features=32, min_distance=6, border=4),
            lk=LKParams(max_level=1),
            matcher=StripeMatcherParams(max_disp=16, templ_cols=9, templ_rows=7, max_matching_cost=0.5),
        ),
        min_obs_connect_edge=2.0,
        min_obs_disconnect_edge=1.0,
    )

    states, graphs = create_fleet_frontend_state(n_cams, mp)
    prev_grays = jnp.mean(bl, axis=-1)
    for _ in range(2):
        (out, cur_grays) = multi_camera_frontend_step(
            states, graphs, prev_grays, bl, br, rig, cfg, mp, mesh
        )
        states, graphs, prev_grays = out.tracker_state, out.graph, cur_grays

    assert out.perception.disparity.shape == (n_cams, H, W)
    assert out.perception.disparity.sharding.spec[0] == "cam"
    assert out.mesher.labels.sharding.spec[0] == "cam"

    # Camera 0 must match the unsharded single-camera pipeline.
    s0 = StereoTrackerState.create(mp.tracker)
    g0 = LandmarkGraph.create(mp.tracker.capacity)
    pg0 = jnp.mean(bl[0], axis=-1)
    for _ in range(2):
        (o0, pg0) = jax.jit(
            lambda s, g, p, l, r: full_frontend_step(s, g, p, l, r, rig, cfg, mp)
        )(s0, g0, pg0, bl[0], br[0])
        s0, g0 = o0.tracker_state, o0.graph

    np.testing.assert_allclose(
        np.asarray(out.perception.disparity[0]), np.asarray(o0.perception.disparity),
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(out.mesher.alive[0]), np.asarray(o0.mesher.alive)
    )
    np.testing.assert_allclose(
        np.asarray(out.mesher.pixels[0]), np.asarray(o0.mesher.pixels), atol=1e-3
    )


@pytest.mark.slow
def test_sharded_perception_step_single_frame(mesh):
    """ONE frame's whole perception pipeline cooperatively over 8 devices
    (rows strip-sharded): equals the single-device pipeline with
    chunks_y = n_devices away from the global border rows."""
    from ocean_perception_tpu.parallel import sharded_perception_step
    from ocean_perception_tpu.stereo.patchmatch import PatchMatchParams, patchmatch_disparity
    from ocean_perception_tpu.ops.image import to_grayscale
    from ocean_perception_tpu.imaging.enhance import enhance_underwater
    from jax.sharding import Mesh

    n = 8
    strip_mesh = Mesh(np.array(jax.devices()[:n]), ("strip",))
    H, W = 192, 96  # 24 rows/strip >= the seed-dilation halo reach (19)
    bl, br = _inputs(1, H=H, W=W)
    left, right = bl[0], br[0]
    rig = _rig(H, W)
    cfg = PerceptionConfig(engine="patchmatch", max_disp=16, internal_scale=1)

    out = sharded_perception_step(left, right, rig, cfg, strip_mesh)
    assert out.disparity.shape == (H, W)

    # Single-device equivalent: same production params with chunks_y = n.
    pm = PatchMatchParams(
        max_disp=16, chunks=16, chunks_y=n, right_wta=True,
        volume_bf16=True, scan_unroll=0,
    )
    gl, gr = to_grayscale(left), to_grayscale(right)
    ref = patchmatch_disparity(gl, gr, pm)
    d_ref = np.asarray(ref.left)
    d_shard = np.asarray(out.disparity)
    np.testing.assert_allclose(d_shard[1:-1], d_ref[1:-1], atol=1e-5)

    depth_ref = np.asarray(rig.disp_to_depth(jnp.asarray(d_ref)))
    depth_ref = np.where(np.isfinite(depth_ref) & (depth_ref <= cfg.max_depth), depth_ref, 0.0)
    enh_ref, _ = enhance_underwater(left, jnp.asarray(depth_ref))
    np.testing.assert_allclose(
        np.asarray(out.enhanced_left)[1:-1], np.asarray(enh_ref)[1:-1], atol=5e-2
    )

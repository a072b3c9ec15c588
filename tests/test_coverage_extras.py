"""Coverage for previously-untested corners: normalization utilities, folder
datasets, math/timing utilities, histogram threshold, triangle mesh, the
remaining fabric nodes, strip-sharded enhancement, and the profiler hooks."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# -- imaging/normalization (reference normalization.hpp:12-46) ----------------


def test_normalization_utilities(rng):
    from ocean_perception_tpu.imaging.normalization import (
        correct_color_ratio,
        enhance_contrast,
        enhance_contrast_factor,
        gamma_to_linear,
        linear_to_gamma,
        normalize_color_illuminant,
        normalize_unit,
        sharpen,
        white_balance_simple,
    )

    img = jnp.asarray(rng.random((40, 60, 3)).astype(np.float32) * 0.5 + 0.1)

    # normalize_unit / enhance_contrast stretch to the unit range.
    out = np.asarray(normalize_unit(img))
    assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6
    ec = np.asarray(enhance_contrast(img))
    assert ec.min() < 0.05 and ec.max() > 0.95

    # Fixed-gain contrast about mid-gray: clip(1.5*(I-0.5)+0.5).
    ecf = np.asarray(enhance_contrast_factor(img))
    np.testing.assert_allclose(
        ecf, np.clip(1.5 * (np.asarray(img) - 0.5) + 0.5, 0.0, 1.0), atol=1e-6
    )

    # Gamma round trip.
    g = linear_to_gamma(img)
    back = gamma_to_linear(g, gamma_power=1.0 / 0.4545)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-4)

    # Channel balancing: all channel means equalized (within numeric slack).
    tinted = img * jnp.asarray([0.3, 0.8, 1.0])
    for fn in (correct_color_ratio, white_balance_simple):
        bal = np.asarray(fn(tinted))
        means = bal.reshape(-1, 3).mean(0)
        assert means.std() / means.mean() < 0.05, fn.__name__

    # Illuminant normalization returns a finite image of the same shape.
    ni = np.asarray(normalize_color_illuminant(tinted))
    assert ni.shape == tinted.shape and np.isfinite(ni).all()

    # Sharpen amplifies an impulse relative to its surround.
    flat = np.full((21, 21), 0.5, np.float32)
    flat[10, 10] = 0.8
    sh = np.asarray(sharpen(jnp.asarray(flat)))
    assert sh[10, 10] > 0.8


# -- ops/histogram: FindDarkFast parity semantics -----------------------------


def test_masked_percentile_threshold(rng):
    from ocean_perception_tpu.ops.histogram import masked_percentile_threshold

    vals = jnp.asarray(rng.random((100, 100)).astype(np.float32))
    mask = jnp.asarray(rng.random((100, 100)) > 0.3)
    t = float(masked_percentile_threshold(vals, mask, 0.01, iters=10))
    frac = float((np.asarray(vals)[np.asarray(mask)] < t).mean())
    assert abs(frac - 0.01) < 0.002  # ±0.1% @ 10 iters (backscatter.cpp:63-64)


# -- core/math_util -----------------------------------------------------------


def test_math_util():
    from ocean_perception_tpu.core.math_util import (
        average,
        deg_to_rad,
        next_even_int,
        next_odd_int,
        rad_to_deg,
        subset,
        subset_from_mask,
        wrap_int,
    )

    assert wrap_int(-1, 5) == 4 and wrap_int(7, 5) == 2
    assert next_even_int(3) == 4 and next_even_int(4) == 4
    assert next_odd_int(4) == 5 and next_odd_int(5) == 5
    assert abs(rad_to_deg(deg_to_rad(57.0)) - 57.0) < 1e-9
    assert subset([10, 20, 30], [2, 0]) == [30, 10]
    assert subset_from_mask([1, 2, 3], [True, False, True]) == [1, 3]
    assert average([1.0, 3.0]) == 2.0


# -- utils/timing + utils/profiling ------------------------------------------


def test_timing_and_profiling(tmp_path):
    from ocean_perception_tpu.utils.profiling import annotate, timed
    from ocean_perception_tpu.utils.timing import DataSubsampler, StatsTracker, Timer

    t = Timer(start=True)
    time.sleep(0.01)
    assert t.elapsed() >= 0.005
    assert t.tock() >= 5.0
    t.reset()

    st = StatsTracker("test")
    for v in (1.0, 3.0, 5.0):
        st.add("lat_ms", v)
    buf = st.stats("lat_ms")
    assert buf.mean() == 3.0 and buf.min() == 1.0 and buf.max() == 5.0

    sub = DataSubsampler(10.0)  # 10 Hz
    taken = sum(sub.should_sample(k * 0.01) for k in range(100))  # 1 s span
    assert 8 <= taken <= 12

    with timed(st, "block_ms", sync=False):
        time.sleep(0.005)
    assert st.stats("block_ms").mean() >= 2.0

    with annotate("unit-test"):
        _ = jnp.sum(jnp.ones(8))


# -- datasets/folder_stereo: HIMB/CADDY/ACFR 10 Hz synthesis ------------------


def test_folder_stereo_datasets(tmp_path, rng):
    import cv2

    from ocean_perception_tpu.datasets import get_dataset_by_name
    from ocean_perception_tpu.datasets.folder_stereo import SYNTH_PERIOD_NS, HimbDataset

    root = tmp_path / "himb"
    for sub in ("left", "right"):
        os.makedirs(root / sub)
        for i in range(3):
            cv2.imwrite(
                str(root / sub / f"{i:03d}.png"),
                (rng.random((24, 32)) * 255).astype(np.uint8),
            )
    ds = HimbDataset(str(root))
    frames = []
    ds.register_stereo_callback(lambda m: frames.append(m))
    while ds.step():
        pass
    assert len(frames) == 3
    # Timestamps synthesized at 10 Hz (himb_dataset.cpp:23 parity).
    assert frames[1].timestamp - frames[0].timestamp == SYNTH_PERIOD_NS
    assert frames[0].left.shape == (24, 32)

    assert isinstance(get_dataset_by_name("himb", str(root)), HimbDataset)


# -- mesher/triangle_mesh -----------------------------------------------------


def test_triangle_mesh_merge_and_export(tmp_path):
    from ocean_perception_tpu.mesher.triangle_mesh import TriangleMesh

    m1 = TriangleMesh(
        vertices=np.array([[0, 0, 1], [1, 0, 1], [0, 1, 1]], float),
        triangles=np.array([[0, 1, 2]], np.int32),
    )
    m2 = TriangleMesh(
        vertices=np.array([[2, 0, 2], [3, 0, 2], [2, 1, 2]], float),
        triangles=np.array([[0, 1, 2]], np.int32),
    )
    merged = TriangleMesh.merge([m1, m2])
    assert merged.num_vertices == 6 and merged.num_triangles == 2
    # Index offsetting: second triangle references the second mesh's verts.
    assert merged.triangles[1].min() >= 3
    assert TriangleMesh.empty().num_triangles == 0


# -- fabric nodes: viewer, recorder, mesher node over the in-process bus ------


def test_image_viewer_node(tmp_path, rng):
    from ocean_perception_tpu.fabric.messages import ImageMessage, StereoImageMessage
    from ocean_perception_tpu.fabric.nodes.image_viewer import ImageViewerNode
    from ocean_perception_tpu.fabric.pubsub import InProcessBus

    bus = InProcessBus()
    ImageViewerNode(bus, "sensors/stereo", str(tmp_path), every_n=1)
    img = rng.random((16, 20)).astype(np.float32)
    bus.publish(
        "sensors/stereo",
        StereoImageMessage(
            timestamp=7,
            left=ImageMessage.from_array(7, img),
            right=ImageMessage.from_array(7, img),
        ),
    )
    files = sorted(os.listdir(tmp_path))
    assert any(f.endswith("_L.png") for f in files)
    assert any(f.endswith("_R.png") for f in files)


def test_camera_recorder_node_roundtrip(tmp_path, rng):
    """Bus → EuRoC recorder → EurocDataset reader round trip (the generic
    half of the reference's zed_recorder, tools/zed_recorder.hpp:48-60)."""
    from ocean_perception_tpu.datasets.euroc import EurocDataset
    from ocean_perception_tpu.fabric.messages import (
        ImageMessage,
        ImuMessage,
        StereoImageMessage,
    )
    from ocean_perception_tpu.fabric.nodes.camera_recorder import CameraRecorderNode
    from ocean_perception_tpu.fabric.pubsub import InProcessBus

    bus = InProcessBus()
    rec = CameraRecorderNode(bus, str(tmp_path))
    img = rng.random((16, 20)).astype(np.float32)
    for k in range(2):
        t = int((k + 1) * 1e8)
        bus.publish(
            "sensors/stereo",
            StereoImageMessage(
                timestamp=t,
                left=ImageMessage.from_array(t, img),
                right=ImageMessage.from_array(t, img),
            ),
        )
        bus.publish("sensors/imu", ImuMessage(t, np.zeros(3), np.array([0, 0, 9.81])))
    rec.finish()

    ds = EurocDataset(str(tmp_path))
    stereo, imu = [], []
    ds.register_stereo_callback(lambda m: stereo.append(m))
    ds.register_imu_callback(lambda m: imu.append(m))
    while ds.step():
        pass
    assert len(stereo) == 2 and len(imu) == 2
    assert stereo[0].left.shape == (16, 20)


def test_uvc_capture_to_euroc(tmp_path, rng):
    """UVC/video capture → EuRoC writer: the SDK-free half of the reference's
    zed_recorder capture loop (zed_recorder.cpp:95-215 — a ZED without its
    SDK is a UVC device delivering side-by-side stereo frames)."""
    cv2 = pytest.importorskip("cv2")
    from ocean_perception_tpu.datasets.euroc import EurocDataset
    from ocean_perception_tpu.datasets.euroc import EurocDataWriter
    from ocean_perception_tpu.fabric.nodes.camera_recorder import UvcStereoSource

    # Side-by-side stereo video: left half bright, right half dark.
    H, W = 32, 48
    path = str(tmp_path / "sbs.avi")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (2 * W, H))
    assert vw.isOpened()
    for k in range(6):
        frame = np.zeros((H, 2 * W, 3), np.uint8)
        frame[:, :W] = 200 - 5 * k
        frame[:, W:] = 40 + 5 * k
        vw.write(frame)
    vw.release()

    writer = EurocDataWriter(str(tmp_path / "out"))
    src = UvcStereoSource(path, sbs=True, camera_hz=100.0, max_duration_sec=30.0)
    n = src.capture(writer, max_frames=4)
    writer.finish()
    assert n == 4

    ds = EurocDataset(str(tmp_path / "out"))
    frames = []
    ds.register_stereo_callback(lambda m: frames.append(m))
    while ds.step():
        pass
    assert len(frames) == 4
    assert frames[0].left.shape == (H, W)
    # left side must be the bright half (MJPG is lossy: wide tolerance)
    assert float(np.mean(frames[0].left)) > 0.6
    assert float(np.mean(frames[0].right)) < 0.4
    # timestamps strictly increasing
    ts = [f.timestamp for f in frames]
    assert all(b > a for a, b in zip(ts, ts[1:]))


@pytest.mark.slow
def test_object_mesher_node_publishes_mesh(rng):
    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.fabric.messages import ImageMessage, StereoImageMessage
    from ocean_perception_tpu.fabric.nodes.object_mesher_node import ObjectMesherNode
    from ocean_perception_tpu.fabric.pubsub import InProcessBus
    from ocean_perception_tpu.mesher.object_mesher import (
        ObjectMesherDeviceParams,
        ObjectMesherParams,
    )
    from ocean_perception_tpu.tracking import (
        DetectorParams,
        LKParams,
        StripeMatcherParams,
    )
    from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerParams

    import cv2

    H, W, disp = 120, 160, 8
    canvas = cv2.GaussianBlur(rng.random((H, W + 40)).astype(np.float32), (5, 5), 1.0)
    left = canvas[:, 20 : 20 + W]
    right = canvas[:, 20 + disp : 20 + disp + W]

    cam = PinholeCamera.create(150.0, 150.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = ObjectMesherParams(
        device=ObjectMesherDeviceParams(
            tracker=StereoTrackerParams(
                capacity=48,
                detector=DetectorParams(max_features=48, min_distance=8, border=6),
                lk=LKParams(max_level=1),
                matcher=StripeMatcherParams(
                    max_disp=16, templ_cols=11, templ_rows=9, max_matching_cost=0.5
                ),
            ),
            foreground_min_gradient=0.0,  # whole textured scene is foreground
            edge_max_depth_change=10.0,
            min_obs_connect_edge=1.0,
            min_obs_disconnect_edge=0.0,
        ),
        vertex_min_obs=1,
    )
    bus = InProcessBus()
    meshes = []
    bus.subscribe("object_mesher/mesh", lambda _c, m: meshes.append(m))
    ObjectMesherNode(bus, rig, params=params)
    for k in range(3):
        t = int((k + 1) * 1e8)
        bus.publish(
            "sensors/stereo",
            StereoImageMessage(
                timestamp=t,
                left=ImageMessage.from_array(t, left),
                right=ImageMessage.from_array(t, right),
            ),
        )
    assert meshes, "mesher node published no mesh"
    m = meshes[-1]
    assert m.vertices.shape[1] == 3 and m.triangles.shape[1] == 3
    # Backprojected depth near truth: z = fx*b/disp = 150*0.2/8 = 3.75 m.
    z = m.vertices[:, 2]
    assert 2.0 < np.median(z) < 6.0


# -- parallel/spatial: strip-sharded enhance vs single device -----------------


@pytest.mark.slow
def test_sharded_enhance_matches_single_device(rng):
    from ocean_perception_tpu.imaging.enhance import enhance_underwater
    from ocean_perception_tpu.parallel import make_mesh, sharded_enhance

    img = jnp.asarray(rng.random((64, 96, 3)).astype(np.float32) * 0.5 + 0.2)
    z = jnp.full((64, 96), 2.0, jnp.float32)
    mesh = make_mesh(4, axis_names=("cam", "strip"), shape=(2, 2))
    with mesh:
        out_s, info_s = sharded_enhance(img, z, mesh)
    out_1, info_1 = enhance_underwater(img, z)
    np.testing.assert_allclose(
        float(info_s.error_backscatter), float(info_1.error_backscatter), atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_1), atol=0.05)


@pytest.mark.slow
def test_object_mesher_node_downscaled_geometry(rng):
    """mesher_input_height path: the node rescales the mesher's RIG so
    reduced-scale pixels/disparities backproject to the same world geometry
    as full-res processing (scaling only the disparity would be wrong in
    x/y by the scale factor)."""
    import cv2

    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.fabric.messages import ImageMessage, StereoImageMessage
    from ocean_perception_tpu.fabric.nodes.object_mesher_node import ObjectMesherNode
    from ocean_perception_tpu.fabric.pubsub import InProcessBus
    from ocean_perception_tpu.mesher.object_mesher import (
        ObjectMesherDeviceParams,
        ObjectMesherParams,
    )
    from ocean_perception_tpu.tracking import (
        DetectorParams,
        LKParams,
        StripeMatcherParams,
    )
    from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerParams

    H, W, disp = 240, 320, 16  # full-res disparity 16 -> 8 at half scale
    canvas = cv2.GaussianBlur(rng.random((H, W + 60)).astype(np.float32), (7, 7), 1.5)
    left = canvas[:, 30 : 30 + W]
    right = canvas[:, 30 + disp : 30 + disp + W]

    cam = PinholeCamera.create(150.0, 150.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = ObjectMesherParams(
        device=ObjectMesherDeviceParams(
            tracker=StereoTrackerParams(
                capacity=48,
                detector=DetectorParams(max_features=48, min_distance=8, border=6),
                lk=LKParams(max_level=1),
                matcher=StripeMatcherParams(
                    max_disp=16, templ_cols=11, templ_rows=9, max_matching_cost=0.5
                ),
            ),
            foreground_min_gradient=0.0,
            edge_max_depth_change=10.0,
            min_obs_connect_edge=1.0,
            min_obs_disconnect_edge=0.0,
        ),
        vertex_min_obs=1,
    )
    bus = InProcessBus()
    meshes = []
    bus.subscribe("object_mesher/mesh", lambda _c, m: meshes.append(m))
    node = ObjectMesherNode(bus, rig, params=params, mesher_input_height=H // 2)
    assert node.mesher.rig.left.height == H // 2  # rig rescaled, not disparity
    for k in range(3):
        t = int((k + 1) * 1e8)
        bus.publish(
            "sensors/stereo",
            StereoImageMessage(
                timestamp=t,
                left=ImageMessage.from_array(t, left),
                right=ImageMessage.from_array(t, right),
            ),
        )
    assert meshes, "downscaled mesher node published no mesh"
    z = meshes[-1].vertices[:, 2]
    # Truth: z = fx*b/disp = 150*0.2/16 = 1.875 m, unchanged by downscaling.
    assert 1.2 < np.median(z) < 2.8, np.median(z)

"""Farm perception node: N cameras -> one batched step -> per-camera meshes
(fabric/nodes/farm_perception_node.py). No reference analog — the reference
runs one object_mesher_lcm process per camera; here the fleet is a batch
axis of a single jitted program."""

import time

import cv2
import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.fabric.messages import ImageMessage, StereoImageMessage
from ocean_perception_tpu.fabric.nodes.farm_perception_node import FarmPerceptionNode
from ocean_perception_tpu.fabric.pubsub import InProcessBus
from ocean_perception_tpu.mesher import ObjectMesher, ObjectMesherParams
from ocean_perception_tpu.mesher.object_mesher import ObjectMesherDeviceParams
from ocean_perception_tpu.models.perception import PerceptionConfig
from ocean_perception_tpu.tracking import DetectorParams, LKParams, StripeMatcherParams
from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerParams

H, W = 120, 160


def _scene(seed: int, d_obj: float = 12.0):
    """Textured box over flat background (test_mesher's meshable scene)."""
    rng = np.random.default_rng(seed)
    bg = np.full((H, W + 20), 0.45, np.float32)
    bg += rng.normal(0, 0.004, bg.shape).astype(np.float32)
    obj = (rng.random((60, 70)) * 0.8 + 0.1).astype(np.float32)
    obj = cv2.GaussianBlur(obj, (3, 3), 0.7)
    left = bg[:, :W].copy()
    left[30:90, 60:130] = obj
    right = bg[:, :W].copy()
    x0r = 60 - int(d_obj)
    right[30:90, x0r : x0r + 70] = obj
    return left, right


def _rig():
    cam = PinholeCamera.create(200.0, 200.0, W / 2, H / 2, H, W)
    return StereoCamera.create(cam, cam, baseline=0.3)


def _device_params():
    return ObjectMesherDeviceParams(
        tracker=StereoTrackerParams(
            capacity=64,
            detector=DetectorParams(max_features=64, min_distance=8, border=6),
            lk=LKParams(max_level=2),
            matcher=StripeMatcherParams(
                max_disp=24, templ_cols=11, templ_rows=11, max_matching_cost=0.4
            ),
            trigger_keyframe_k=2,
        ),
        min_obs_connect_edge=3.0,
        min_obs_disconnect_edge=2.0,
        neighbor_radius_px=60.0,
    )


def _fast_config():
    # Cheap dense pass for CPU tests: the mesher consumes the gray images,
    # not the disparity map, so the perception half can run with the WTA
    # engine (patchmatch at this size is ~54 s/step on CPU).
    return PerceptionConfig(
        engine="wta", max_disp=16, internal_scale=1, run_enhance=False
    )


def _stereo_msg(ts, left, right):
    return StereoImageMessage(
        timestamp=ts, camera_id=0,
        left=ImageMessage.from_array(ts, left),
        right=ImageMessage.from_array(ts, right),
    )


def _wait(cond, timeout=180.0):  # generous: fleet steps slow under suite-wide CPU load
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.05)
    return cond()


@pytest.mark.slow
def test_farm_node_meshes_both_cameras_and_matches_single_camera():
    bus = InProcessBus()
    rig = _rig()
    node = FarmPerceptionNode(
        bus, rig, n_cameras=2,
        perception_config=_fast_config(),
        mesher_params=_device_params(),
        max_sync_wait_sec=30.0,  # force the all-fresh path
    )
    meshes = {0: [], 1: []}
    bus.subscribe("farm/mesh/cam0", lambda _c, m: meshes[0].append(m))
    bus.subscribe("farm/mesh/cam1", lambda _c, m: meshes[1].append(m))

    # Two cameras see DIFFERENT scenes (different seeds -> different feature
    # sets) so cross-camera state bleed would be visible.
    frames = {0: _scene(3), 1: _scene(7)}
    n_steps = 6
    for k in range(n_steps):
        ts = (k + 1) * 100_000_000
        for cam in (0, 1):
            bus.publish(f"sensors/stereo/cam{cam}", _stereo_msg(ts, *frames[cam]))
        assert _wait(lambda: node.fleet_steps == k + 1), (
            f"fleet step {k + 1} never fired (got {node.fleet_steps})"
        )

    assert node.stale_fills == 0
    assert meshes[0] and meshes[1], "both cameras must publish meshes"

    # Per-camera equivalence: the batched fleet step must evolve each
    # camera's tracker/graph exactly like the single-camera ObjectMesher
    # (same device params, same frames).
    for cam in (0, 1):
        single = ObjectMesher(
            ObjectMesherParams(device=_device_params()), rig
        )
        # The fleet state carries the k-ago pyramid ring (image_shape given
        # at creation); give the single-camera reference the same ring so
        # the tracking semantics match.
        from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerState

        single.tracker_state = StereoTrackerState.create(
            _device_params().tracker, image_shape=(H, W)
        )
        for _ in range(n_steps):
            ref_mesh = single.process_stereo(*frames[cam])
        got = meshes[cam][-1]
        assert got.vertices.shape == ref_mesh.vertices.shape
        np.testing.assert_allclose(got.vertices, ref_mesh.vertices, atol=1e-3)
        np.testing.assert_array_equal(got.triangles, ref_mesh.triangles)
        # Sanity: the object sits at fx*b/d = 200*0.3/12 = 5 m.
        assert abs(np.median(got.vertices[:, 2]) - 5.0) < 0.6

    node.close()


@pytest.mark.slow
def test_farm_node_survives_dead_camera():
    """A camera that stops publishing must not stall the fleet: after
    max_sync_wait the step fires with a stale fill and live cameras keep
    their outputs (SURVEY §5.3 failure-detection stance)."""
    bus = InProcessBus()
    node = FarmPerceptionNode(
        bus, _rig(), n_cameras=2,
        perception_config=_fast_config(),
        mesher_params=_device_params(),
        max_sync_wait_sec=0.3,
    )
    meshes = {0: [], 1: []}
    bus.subscribe("farm/mesh/cam0", lambda _c, m: meshes[0].append(m))
    bus.subscribe("farm/mesh/cam1", lambda _c, m: meshes[1].append(m))

    l, r = _scene(3)
    # Warm both cameras for 3 synchronized steps...
    for k in range(3):
        ts = (k + 1) * 100_000_000
        for cam in (0, 1):
            bus.publish(f"sensors/stereo/cam{cam}", _stereo_msg(ts, l, r))
        assert _wait(lambda: node.fleet_steps == k + 1)
    # ...then cam1 dies. The fleet must keep stepping on cam0 alone.
    for k in range(3, 6):
        ts = (k + 1) * 100_000_000
        bus.publish("sensors/stereo/cam0", _stereo_msg(ts, l, r))
        assert _wait(lambda: node.fleet_steps == k + 1), (
            "fleet stalled on the dead camera"
        )
    assert node.stale_fills >= 3
    n_cam1 = len(meshes[1])
    assert len(meshes[0]) > n_cam1, "live camera must keep publishing"
    node.close()


@pytest.mark.slow
def test_farm_node_mesher_scale_depth_invariant():
    """mesher_scale=2 tracks at half resolution (the reference mesher node's
    mesher_input_height downscale); meshes must still back-project to the
    TRUE metric depth — the rescaled-rig + scaled-fxb composition is what
    this locks (scaling only one of them silently halves/doubles depth)."""
    bus = InProcessBus()
    node = FarmPerceptionNode(
        bus, _rig(), n_cameras=1,
        perception_config=_fast_config(),
        mesher_params=_device_params(),
        max_sync_wait_sec=30.0,
        mesher_scale=2,
    )
    meshes = []
    bus.subscribe("farm/mesh/cam0", lambda _c, m: meshes.append(m))
    l, r = _scene(3)
    for k in range(8):
        bus.publish("sensors/stereo/cam0", _stereo_msg((k + 1) * 100_000_000, l, r))
        assert _wait(lambda: node.fleet_steps == k + 1)
    assert meshes, "downscaled tracking must still produce meshes"
    z = np.median(meshes[-1].vertices[:, 2])
    assert abs(z - 5.0) < 0.8, f"depth {z} != 5.0 (rig/fxb scale mismatch)"
    node.close()


@pytest.mark.slow
def test_farm_node_u8_wire_path_matches_f32():
    """u8 wire frames ride to the device as 1 byte/pixel and cast on-chip
    (sharded_pipeline._prep); the meshes must equal the f32 path exactly
    (the source frames are u8-quantized, so u8/255 == the f32 payload)."""
    l, r = _scene(3)
    u8l = (np.clip(l, 0, 1) * 255 + 0.5).astype(np.uint8)
    u8r = (np.clip(r, 0, 1) * 255 + 0.5).astype(np.uint8)
    f32l, f32r = u8l.astype(np.float32) / 255.0, u8r.astype(np.float32) / 255.0

    def run(encoding):
        bus = InProcessBus()
        node = FarmPerceptionNode(
            bus, _rig(), n_cameras=1,
            perception_config=_fast_config(),
            mesher_params=_device_params(),
        )
        meshes = []
        bus.subscribe("farm/mesh/cam0", lambda _c, m: meshes.append(m))
        for k in range(6):
            ts = (k + 1) * 100_000_000
            if encoding == "u8":
                im = lambda: ImageMessage(ts, u8l.shape[1], u8l.shape[0], 1, "u8", u8l.tobytes())
                imr = lambda: ImageMessage(ts, u8r.shape[1], u8r.shape[0], 1, "u8", u8r.tobytes())
                msg = StereoImageMessage(ts, 0, im(), imr())
            else:
                msg = StereoImageMessage(
                    ts, 0,
                    ImageMessage.from_array(ts, f32l),
                    ImageMessage.from_array(ts, f32r),
                )
            bus.publish("sensors/stereo/cam0", msg)
            assert _wait(lambda: node.fleet_steps == k + 1)
        node.close()
        return meshes

    m_u8 = run("u8")
    m_f32 = run("f32")
    assert m_u8 and len(m_u8) == len(m_f32)
    np.testing.assert_array_equal(m_u8[-1].vertices, m_f32[-1].vertices)
    np.testing.assert_array_equal(m_u8[-1].triangles, m_f32[-1].triangles)


def test_farm_node_rejects_wrong_size_frames():
    """A mis-sized frame (wrong camera config / corrupted stream) must be
    rejected at ingest, not crash the fleet thread at np.stack time."""
    bus = InProcessBus()
    node = FarmPerceptionNode(
        bus, _rig(), n_cameras=1,
        perception_config=_fast_config(),
        mesher_params=_device_params(),
    )
    bad = np.zeros((H // 2, W // 2), np.float32)
    bus.publish("sensors/stereo/cam0", _stereo_msg(1, bad, bad))
    assert _wait(lambda: node.rejected_frames == 1, timeout=5.0)
    assert node.frames_in == 0

    # The fleet still works afterwards.
    l, r = _scene(3)
    bus.publish("sensors/stereo/cam0", _stereo_msg(2, l, r))
    assert _wait(lambda: node.fleet_steps == 1)
    node.close()


def test_farm_node_from_config(tmp_path):
    """The shipped FarmPerceptionNode.yaml + a shared rig builds the node."""
    from ocean_perception_tpu.fabric.nodes.farm_perception_node import from_config

    bus = InProcessBus()
    node = from_config(
        bus,
        "config/nodes/FarmPerceptionNode.yaml",
        "config/shared/Farmsim.yaml",
    )
    assert node.n_cameras == 4
    assert node.config.internal_scale == 4
    assert node.config.max_disp == 128
    assert node.mesher_params.tracker.capacity > 0
    node.close()

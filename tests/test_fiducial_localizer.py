"""Fiducial localizer node: tag sightings on the bus -> absolute pose fixes.

Closes the loop the reference left open (vendored AprilTags, never wired):
rendered tag board -> detect -> multi-tag LM localization -> PoseStamped fix
on vio/external_pose -> StateEstimator.receive_pose filter snap.
"""

import os

import numpy as np
import pytest

from test_apriltags import (  # sibling module: rendering + board helpers
    _board_world_tags,
    _pose_rt,
    _render_projected,
    _rotm,
)

from ocean_perception_tpu.fabric.messages import (
    ImageMessage,
    PoseStampedMessage,
    StereoImageMessage,
)
from ocean_perception_tpu.fabric.nodes.fiducial_localizer_node import (
    FiducialLocalizerNode,
    from_config,
)
from ocean_perception_tpu.fabric.pubsub import InProcessBus
from ocean_perception_tpu.tracking.apriltags import TagFamily

FX = FY = 600.0
CX, CY, H, W = 320.0, 240.0, 480, 640
TAG_S = 0.19


def _render_board(tags, cam_T_world):
    fam = TagFamily.create("tag36h11")
    img = np.ones((H, W))
    for tid, wTt in tags.items():
        cTt = cam_T_world @ wTt
        tag_img = _render_projected(
            fam, tid, TAG_S, cTt[:3, :3], cTt[:3, 3], FX, FY, CX, CY, H, W, noise=0.0
        )
        img = np.minimum(img, tag_img)
    return img.astype(np.float32)


def test_from_config_parses_map_and_channels(tmp_path):
    shared = os.path.join(
        os.path.dirname(__file__), "..", "config", "shared", "Farmsim.yaml"
    )
    node_yaml = os.path.join(
        os.path.dirname(__file__), "..", "config", "nodes", "FiducialLocalizerNode.yaml"
    )
    bus = InProcessBus()
    node = from_config(bus, node_yaml, shared)
    assert set(node.tag_map) == {0, 1}
    np.testing.assert_allclose(node.tag_map[1][:3, 3], [0.5, 0, 0])
    assert node.channel_output == "vio/external_pose"
    assert node.tag_size_m == 0.19


@pytest.mark.slow
def test_node_publishes_fix_with_extrinsics():
    """Rendered 4-tag board -> fix published; world_T_body composes the
    NON-identity body_T_cam (camera yawed 90 deg on the body)."""
    tags = _board_world_tags(TAG_S)
    R = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    R = _rotm("y", 0.10) @ _rotm("x", -0.07) @ R
    c = np.array([0.28, 0.22, 1.4])
    cam_T_world = _pose_rt(R, -R @ c)
    world_T_cam = np.linalg.inv(cam_T_world)
    body_T_cam = _pose_rt(_rotm("z", np.pi / 2), [0.1, 0.0, -0.05])

    bus = InProcessBus()
    fixes = []
    bus.subscribe("vio/external_pose", lambda _c, m: fixes.append(m))
    node = FiducialLocalizerNode(
        bus, FX, FY, CX, CY, tags, TAG_S, body_T_cam=body_T_cam,
    )
    img = _render_board(tags, cam_T_world)
    bus.publish(
        "sensors/stereo",
        StereoImageMessage(
            timestamp=10_000_000,
            left=ImageMessage.from_array(10_000_000, img),
            right=ImageMessage.from_array(10_000_000, img),
        ),
    )
    assert node.num_fixes == 1 and len(fixes) == 1
    m: PoseStampedMessage = fixes[0]
    expected = world_T_cam @ np.linalg.inv(body_T_cam)
    np.testing.assert_allclose(m.pose[4:7], expected[:3, 3], atol=5e-3)
    # Orientation: quaternion -> matrix, compare.
    import jax.numpy as jnp

    from ocean_perception_tpu.core.quaternion import quat_to_matrix

    Rm = np.asarray(quat_to_matrix(jnp.asarray(m.pose[:4])))
    assert np.abs(Rm - expected[:3, :3]).max() < 5e-3
    assert m.covariance is not None and m.covariance.shape == (6, 6)

    # Rate gate: an immediate second frame is skipped...
    bus.publish(
        "sensors/stereo",
        StereoImageMessage(
            timestamp=10_000_001,
            left=ImageMessage.from_array(10_000_001, img),
            right=ImageMessage.from_array(10_000_001, img),
        ),
    )
    assert node.num_fixes == 1
    # ...a frame past min_period is processed.
    t2 = 10_000_000 + int(0.6e9)
    bus.publish(
        "sensors/stereo",
        StereoImageMessage(
            timestamp=t2,
            left=ImageMessage.from_array(t2, img),
            right=ImageMessage.from_array(t2, img),
        ),
    )
    assert node.num_fixes == 2


@pytest.mark.slow
def test_closed_loop_relocalization_snaps_estimator():
    """fiducial node + estimator node on one bus: biased IMU drifts the
    filter, one tag sighting snaps it to the surveyed absolute pose."""
    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.fabric.messages import ImuMessage
    from ocean_perception_tpu.fabric.nodes.state_estimator_node import (
        StateEstimatorNode,
    )
    from ocean_perception_tpu.vio.state_estimator import StateEstimatorParams

    GRAVITY = np.array([0.0, 0.0, 9.81])
    cam = PinholeCamera.create(FX, FY, CX, CY, H, W)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        min_sec_btw_keyposes=1e6,  # isolate the filter aiding path
        max_sec_btw_keyposes=2e6,
    )
    bus = InProcessBus()
    est_node = StateEstimatorNode(bus, rig, params)
    bus.publish(
        "vio/init_pose",
        PoseStampedMessage(timestamp=0, pose=np.array([1.0, 0, 0, 0, 0, 0, 0])),
    )
    assert est_node._init.wait(timeout=30)

    # The fiducial node watches its own camera channel so the estimator's
    # VIO frontend never sees the (textureless) board frames.
    tags = _board_world_tags(TAG_S)
    node = FiducialLocalizerNode(
        bus, FX, FY, CX, CY, tags, TAG_S,
        channel_input="fiducial/stereo",
        pose_sigma_t=0.01, pose_sigma_r=0.01,
    )

    bias = np.array([0.15, -0.1, 0.0])
    last_t = 0
    for i in range(1, 201):  # 2 s of biased IMU at rest
        last_t = int(i * 1e7)
        bus.publish(
            "sensors/imu",
            ImuMessage(
                timestamp=last_t,
                angular_velocity=np.zeros(3),
                linear_acceleration=-GRAVITY + bias,
            ),
        )
    drift = np.linalg.norm(est_node.est.filter_state().world_T_body[:3, 3])
    assert drift > 0.1, drift

    # One board sighting: true body pose = world_T_cam (identity mount).
    R = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    c = np.array([0.28, 0.22, 1.4])
    cam_T_world = _pose_rt(R, -R @ c)
    img = _render_board(tags, cam_T_world)
    bus.publish(
        "fiducial/stereo",
        StereoImageMessage(
            timestamp=last_t,
            left=ImageMessage.from_array(last_t, img),
            right=ImageMessage.from_array(last_t, img),
        ),
    )
    assert node.num_fixes == 1
    p = est_node.est.filter_state().world_T_body[:3, 3]
    np.testing.assert_allclose(p, np.linalg.inv(cam_T_world)[:3, 3], atol=0.02)

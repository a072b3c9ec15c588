"""Config bindings: repo YAML files → pipeline params."""

import os

import numpy as np

from ocean_perception_tpu.config import YamlParser
from ocean_perception_tpu.config.bindings import (
    load_imu_calibration,
    load_mesher_params,
    load_rig,
    load_tracker_params,
)
from ocean_perception_tpu.utils.paths import config_path, shared_config_path

NODE = os.path.join(os.path.dirname(__file__), "..", "config", "nodes", "ObjectMesherNode.yaml")
SHARED = os.path.join(os.path.dirname(__file__), "..", "config", "shared", "Farmsim.yaml")


def test_repo_config_files_load():
    p = YamlParser(node_path=NODE, shared_path=SHARED)
    mesher = load_mesher_params(p)
    assert mesher.device.foreground_ksize == 15
    assert mesher.device.min_obs_connect_edge == 7
    assert mesher.vertex_min_obs == 3
    t = mesher.device.tracker
    assert t.trigger_keyframe_k == 5
    assert t.detector.max_features == 200
    assert t.matcher.templ_cols == 31
    assert t.lk.window == 21

    rig = load_rig(p)
    assert rig.left.width == 672
    np.testing.assert_allclose(float(rig.baseline), 0.2, rtol=1e-6)

    calib = load_imu_calibration(p)
    assert calib.gyro_noise_sigma == 0.0004


def test_paths_helpers():
    assert shared_config_path("Farmsim").endswith(os.path.join("config", "shared", "Farmsim.yaml"))
    assert os.path.exists(shared_config_path("Farmsim"))


def test_lk_zncc_yaml_bindings(tmp_path):
    """klt_bwd_levels forcibly engages the ZNCC appearance gate, so the gate
    threshold (and the standalone gate switch) must be YAML-tunable alongside
    it (ADVICE r3: config-driven deployments could enable truncation but not
    tune/disable the 0.5 appearance threshold that ships with it)."""
    from ocean_perception_tpu.config.bindings import load_lk_params

    y = tmp_path / "trk.yaml"
    y.write_text(
        "klt_winsize: 17\nklt_bwd_levels: 2\nklt_bwd_zncc_min: 0.25\n"
        "klt_zncc_gate: 1\n"
    )
    lk = load_lk_params(YamlParser(str(y)))
    assert lk.window == 17
    assert lk.bwd_levels == 2
    assert lk.bwd_zncc_min == 0.25
    assert lk.zncc_gate is True
    # Defaults preserved when keys absent.
    y2 = tmp_path / "trk2.yaml"
    y2.write_text("klt_winsize: 21\n")
    lk2 = load_lk_params(YamlParser(str(y2)))
    assert lk2.bwd_zncc_min == 0.5 and lk2.zncc_gate is False


def test_bwd_init_tol_slack_guard():
    """The truncated-backward init offset must stay inside the slack-window
    walk's freeze boundary while keeping the >tol diagonal rejection
    property; incompatible (fwd_bwd_tol, search_slack) pairs are a trace-time
    error, not a silent 100% rejection (ADVICE r3)."""
    import jax.numpy as jnp
    import pytest

    from ocean_perception_tpu.tracking.lk import LKParams, _bwd_init

    pts = jnp.zeros((3, 2), jnp.float32)
    # Default pairing (tol=2, slack=4): offset unchanged at tol.
    np.testing.assert_allclose(
        np.asarray(_bwd_init(pts, LKParams())), 2.0 * np.ones((3, 2)))
    # tol=4 > slack-1=3: clamped to 3, diagonal 3*sqrt(2)=4.24 > 4 still OK.
    np.testing.assert_allclose(
        np.asarray(_bwd_init(pts, LKParams(fwd_bwd_tol=4.0))), 3.0 * np.ones((3, 2)))
    # tol=5 with slack=4: clamp to 3 loses the property -> loud error.
    with pytest.raises(ValueError, match="search_slack"):
        _bwd_init(pts, LKParams(fwd_bwd_tol=5.0))
    # Non-slack mode (search_slack=0): unclamped, any tol fine.
    np.testing.assert_allclose(
        np.asarray(_bwd_init(pts, LKParams(fwd_bwd_tol=5.0, search_slack=0))),
        5.0 * np.ones((3, 2)))


EST_NODE = os.path.join(os.path.dirname(__file__), "..", "config", "nodes", "StateEstimatorNode.yaml")
CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "config", "shared")


def test_all_shared_rig_files_load():
    """Every per-rig calibration ships and parses into a working StereoCamera
    (reference config/shared/{Farmsim,HIMB,ACFR,ZEDMini}.yaml)."""
    expect = {
        "Farmsim.yaml": (376, 672, 336.135986),
        "HIMB.yaml": (515, 645, 952.58),
        "ACFR.yaml": (1024, 1360, 1736.49233331),
        "ZEDMini.yaml": (376, 672, 336.135986),
    }
    for fname, (h, w, fx) in expect.items():
        p = YamlParser(node_path=EST_NODE, shared_path=os.path.join(CONFIG_DIR, fname))
        rig = load_rig(p)
        assert rig.left.height == h and rig.left.width == w, fname
        np.testing.assert_allclose(float(rig.left.fx), fx, rtol=1e-6)  # f32 storage
        assert float(rig.baseline) > 0.0, fname
        g = p.get("/shared/n_gravity")
        assert abs(np.linalg.norm(np.asarray(g, float)) - 9.81) < 1e-6


def test_state_estimator_from_yaml_alone():
    """The FULL StateEstimator builds from config files with zero Python-side
    parameter literals (VERDICT item 6; StateEstimatorLcm.yaml:33-60)."""
    from ocean_perception_tpu.config.bindings import load_state_estimator_params
    from ocean_perception_tpu.vio.state_estimator import StateEstimator

    p = YamlParser(node_path=EST_NODE, shared_path=os.path.join(CONFIG_DIR, "ZEDMini.yaml"))
    params = load_state_estimator_params(p)

    # Node-level keys.
    assert params.min_sec_btw_keyposes == 0.5
    assert params.depth_tolerance == 0.05
    assert params.range_tolerance == 0.15
    assert params.soft_correction_pos == 0.1
    # EKF block (sigma_Q_uq is the reference's name for sigma_Q_theta).
    assert params.ekf.sigma_Q_t == 0.1
    assert params.ekf.sigma_Q_theta == 0.05
    assert params.ekf.sigma_R_imu_a == 0.0005
    # Smoother block.
    assert params.smoother.vo_trans_sigma == 0.4
    assert params.smoother.depth_sigma == 0.2
    assert params.smoother.bias_rw_gyro_sigma == 0.0001
    # Frontend cascade down to the matcher.
    assert params.frontend.odometry.max_iters == 20
    assert params.frontend.pixel_sigma == 5.0
    assert params.frontend.tracker.trigger_keyframe_k == 5
    assert params.frontend.tracker.matcher.max_disp == 128
    assert params.frontend.tracker.lk.max_level == 4
    # Shared rig file feeds gravity + IMU noise (ZEDMini noise model).
    np.testing.assert_allclose(params.n_gravity, [0, 9.81, 0])
    np.testing.assert_allclose(params.imu_calib.accel_noise_sigma, 0.0003924)

    rig = load_rig(p)
    est = StateEstimator(params, rig)
    est.initialize(0, np.eye(4))
    assert est.ekf_state is not None


def test_state_estimator_node_from_config():
    """StateEstimatorNode.from_config wires channels + rig + params from the
    YAML pair and processes bus traffic end to end."""
    from ocean_perception_tpu.fabric.nodes.state_estimator_node import StateEstimatorNode
    from ocean_perception_tpu.fabric.pubsub import InProcessBus
    from ocean_perception_tpu.fabric.messages import ImuMessage, PoseStampedMessage

    bus = InProcessBus()
    node = StateEstimatorNode.from_config(
        bus, EST_NODE, os.path.join(CONFIG_DIR, "ZEDMini.yaml")
    )
    assert node._channels["channel_input_imu"] == "sensors/imu"
    poses = []
    bus.subscribe("vio/pose/filter", lambda _c, m: poses.append(m))
    bus.publish(
        "vio/init_pose",
        PoseStampedMessage(timestamp=0, pose=np.array([1.0, 0, 0, 0, 0, 0, 0])),
    )
    for k in range(5):
        bus.publish(
            "sensors/imu",
            ImuMessage(
                timestamp=int((k + 1) * 1e7),
                angular_velocity=np.zeros(3),
                linear_acceleration=np.array([0.0, -9.81, 0.0]),
            ),
        )
    assert node.est.ekf_state is not None
    assert len(poses) >= 1  # rate-limited filter pose published

    # External pose fix channel: drift the filter with biased IMU (x-accel
    # on the at-rest ZEDMini rig), then a relocalization pose must snap it
    # back — a strict-improvement assertion, so broken channel wiring fails.
    for k in range(5, 35):  # 0.30 s more, below the min_sec keypose gate
        bus.publish(
            "sensors/imu",
            ImuMessage(
                timestamp=int((k + 1) * 1e7),
                angular_velocity=np.zeros(3),
                linear_acceleration=np.array([1.0, -9.81, 0.0]),
            ),
        )
    drifted = np.linalg.norm(node.est.filter_state().world_T_body[:3, 3])
    assert drifted > 0.01, drifted
    bus.publish(
        "vio/external_pose",
        PoseStampedMessage(
            timestamp=int(34.5e7),
            pose=np.array([1.0, 0, 0, 0, 0.0, 0.0, 0.0]),
            covariance=np.eye(6) * 1e-6,
        ),
    )
    fixed = np.linalg.norm(node.est.filter_state().world_T_body[:3, 3])
    assert fixed < 0.5 * drifted, (fixed, drifted)


def test_nodes_build_from_the_reference_own_yaml():
    """Drop-in migration: BOTH nodes construct directly from the reference
    repo's UNMODIFIED config files (config/auv/lcm_nodes/*.yaml + the shared
    rig), picking up its channel names, queue sizes, and algorithm params —
    a reference-era deployment's configs keep working verbatim."""
    from conftest import REFERENCE_DIR, has_reference
    from ocean_perception_tpu.fabric.nodes.object_mesher_node import from_config
    from ocean_perception_tpu.fabric.nodes.state_estimator_node import StateEstimatorNode
    from ocean_perception_tpu.fabric.pubsub import InProcessBus

    if not has_reference():
        import pytest

        pytest.skip("reference repo not mounted")
    ref_cfg = os.path.join(REFERENCE_DIR, "config")
    est = StateEstimatorNode.from_config(
        InProcessBus(),
        os.path.join(ref_cfg, "auv/lcm_nodes/StateEstimatorLcm.yaml"),
        os.path.join(ref_cfg, "shared/Farmsim.yaml"),
    )
    assert est._channels["channel_input_imu"] == "sim/auv/imu"
    assert est._channels["channel_output_filter_pose"] == "vio/filter/world_P_body"
    mesher = from_config(
        InProcessBus(),
        os.path.join(ref_cfg, "auv/lcm_nodes/ObjectMesherLcm.yaml"),
        os.path.join(ref_cfg, "shared/Farmsim.yaml"),
    )
    assert mesher.mesher.params.device.foreground_ksize == 15


def test_object_mesher_node_from_config():
    """ObjectMesher node builds fully from the shipped YAML pair, including
    mesher_input_height rig rescaling and channel names."""
    from ocean_perception_tpu.fabric.nodes.object_mesher_node import from_config
    from ocean_perception_tpu.fabric.pubsub import InProcessBus

    node = from_config(
        InProcessBus(), NODE, os.path.join(CONFIG_DIR, "Farmsim.yaml")
    )
    assert node.channel_output == "object_mesher/mesh"
    # Farmsim rig is 376 tall; mesher_input_height 376 -> no rescale.
    assert node.mesher.rig.left.height == 376
    assert node.mesher.params.device.foreground_ksize == 15

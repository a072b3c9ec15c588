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

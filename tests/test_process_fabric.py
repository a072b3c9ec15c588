"""Process-level VIO smoke over the fabric (VERDICT item 9): a synthetic
EuRoC dataset replayed as raw sensor messages over the UDP multicast bus into
a state_estimator_node running in a SEPARATE process, built entirely from
YAML config. Asserts final smoother-pose accuracy and that the filter output
rate is at least the smoother's.

Reference parity: tools/vio_dataset_player/main.cpp:65-168 +
lcm_nodes/state_estimator_lcm.cpp (the primary executable path).
"""

import os
import subprocess
import sys
import tempfile
import threading
import time

import numpy as np
import pytest

from synthetic_vio import NODE_YAML, SHARED_YAML, write_synthetic_euroc, x_of

REPO = os.path.join(os.path.dirname(__file__), "..")
PORT = 7911  # distinct from DEFAULT_PORT to avoid cross-talk


@pytest.mark.slow
@pytest.mark.parametrize("transport", ["custom", "lcm"])
def test_vio_over_udp_two_processes(transport):
    """transport="custom" drives the in-house wire format; transport="lcm"
    runs the identical mission with BOTH processes speaking real LCM wire
    (fabric/lcm_wire.py) — the reference ecosystem's protocol."""
    from ocean_perception_tpu.fabric.lcm_wire import LcmUdpBus
    from ocean_perception_tpu.fabric.nodes.dataset_player import publish_sensors
    from ocean_perception_tpu.fabric.pubsub import UdpMulticastBus

    port = PORT if transport == "custom" else PORT + 1
    bus_cls = UdpMulticastBus if transport == "custom" else LcmUdpBus

    tmp = tempfile.mkdtemp()
    write_synthetic_euroc(tmp, n_frames=16)
    shared_path = os.path.join(tmp, "shared.yaml")
    node_path = os.path.join(tmp, "node.yaml")
    with open(shared_path, "w") as f:
        f.write(SHARED_YAML)
    with open(node_path, "w") as f:
        f.write(NODE_YAML)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [
            sys.executable, "-m",
            "ocean_perception_tpu.fabric.nodes.state_estimator_node",
            "--config", node_path, "--shared", shared_path, "--port", str(port),
            "--trajectory-out", os.path.join(tmp, "trajectory.csv"),
        ] + (["--lcm"] if transport == "lcm" else []),
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # Wait for the node to announce readiness (imports + subscriptions).
        # Lines are drained on a thread: a bare readline() would block PAST
        # the deadline if the child goes silent (e.g. hangs in backend init),
        # turning a failure into a suite-wide hang.
        child_lines: list = []
        t_reader = threading.Thread(
            target=lambda: child_lines.extend(iter(proc.stdout.readline, "")),
            daemon=True,
        )
        t_reader.start()
        deadline = time.time() + 120
        while time.time() < deadline:
            if any("listening" in ln for ln in child_lines):
                break
            if proc.poll() is not None:
                break
            time.sleep(0.2)
        assert any("listening" in ln for ln in child_lines), (
            f"node never came up; output: {''.join(child_lines)[-2000:]!r}"
        )

        bus = bus_cls(port=port)
        filter_poses, smoother_poses = [], []
        lock = threading.Lock()
        bus.subscribe(
            "vio/pose/filter",
            lambda _c, m: (lock.__enter__(), filter_poses.append(m), lock.__exit__(None, None, None)),
        )
        bus.subscribe(
            "vio/pose/smoother",
            lambda _c, m: (lock.__enter__(), smoother_poses.append(m), lock.__exit__(None, None, None)),
        )

        # Replay at real time: the 8 MB socket buffer rides out the node's
        # first-frame jit compiles without dropping frames.
        n = publish_sensors("euroc", tmp, bus, speed=1.0)
        assert n == 16

        # The node keeps processing its queued backlog after the replay ends.
        deadline = time.time() + 600
        while time.time() < deadline:
            with lock:
                if smoother_poses and smoother_poses[-1].timestamp >= int(1.2e9):
                    break
            if proc.poll() is not None:
                break
            time.sleep(2.0)

        assert proc.poll() is None, "".join(child_lines)[-2000:]
        with lock:
            n_f, n_s = len(filter_poses), len(smoother_poses)
            assert n_s >= 3, f"smoother poses: {n_s}"
            # Filter output rate >= smoother's (vio/README.md:8-15 contract).
            assert n_f >= n_s, (n_f, n_s)
            last = smoother_poses[-1]
        t_last = last.timestamp * 1e-9
        true_x = x_of(t_last)
        est_x = float(last.pose[4])  # pose = [qw qx qy qz tx ty tz]
        assert abs(est_x - true_x) < 0.2 * true_x + 0.05, (est_x, true_x)
        assert abs(float(last.pose[5])) < 0.15
        assert abs(float(last.pose[6])) < 0.15

        # --trajectory-out wrote a scoreable log: load it with the
        # evaluation CLI's reader and ATE it against the analytic motion.
        from ocean_perception_tpu.vio.evaluation import (
            _load_tum_or_euroc_csv,
            absolute_trajectory_error,
        )

        est_ts, est_poses = _load_tum_or_euroc_csv(os.path.join(tmp, "trajectory.csv"))
        assert len(est_ts) >= 3
        gt_poses = np.stack([np.eye(4) for _ in est_ts])
        gt_poses[:, 0, 3] = [x_of(t * 1e-9) for t in est_ts]
        ate = absolute_trajectory_error(est_ts, est_poses, est_ts, gt_poses, align="none")
        assert ate.rmse < 0.2, ate
    finally:
        proc.kill()
        proc.wait()
        # Leaving the rx thread running under later tests' big XLA compiles
        # adds noise/memory pressure to the rest of the suite.
        try:
            bus.close()
        except Exception:
            pass

"""Transport-chaos robustness: the estimator node must survive dropped,
duplicated, and reordered sensor messages (UDP multicast is best-effort —
the reference's LCM gives the same non-guarantees) with gracefully degraded
accuracy, not crashes or wedges.

Faults are injected with fabric.chaos.ChaosBus at the publish boundary of a
synchronous InProcessBus, so any exception inside the node's handlers
propagates straight into the test (a crash CANNOT hide on a daemon thread),
and runs are seeded/reproducible.
"""

import os
import tempfile

import numpy as np
import pytest

from synthetic_vio import NODE_YAML, SHARED_YAML, write_synthetic_euroc, x_of


def test_chaosbus_semantics():
    """Deterministic drop/dup/holdback bookkeeping on a recording bus."""
    from ocean_perception_tpu.fabric.chaos import ChaosBus
    from ocean_perception_tpu.fabric.pubsub import PubSub

    class Recorder(PubSub):
        def __init__(self):
            self.log = []

        def publish(self, channel, message):
            self.log.append((channel, message))

    rec = Recorder()
    chaos = ChaosBus(
        rec, p_drop=0.2, p_dup=0.1, p_hold=0.2, hold_count=2, seed=7,
        channels={"a"},
    )
    for k in range(200):
        chaos.publish("a", k)
    chaos.publish("b", "reliable")  # unmatched channel: always delivered
    chaos.flush()

    s = chaos.stats
    assert s["published"] == 200
    assert s["dropped"] > 0 and s["duplicated"] > 0 and s["held"] > 0
    vals = [m for c, m in rec.log if c == "a"]
    # Conservation: everything not dropped arrives (dups arrive twice).
    assert len(vals) == 200 - s["dropped"] + s["duplicated"]
    assert ("b", "reliable") in rec.log
    # Holdback produced genuine reordering: some value arrives after a
    # LARGER value (late delivery with an old payload).
    seen_max = -1
    reordered = 0
    for v in vals:
        if v < seen_max:
            reordered += 1
        seen_max = max(seen_max, v)
    assert reordered > 0

    # Same seed -> identical fault schedule.
    rec2 = Recorder()
    chaos2 = ChaosBus(
        rec2, p_drop=0.2, p_dup=0.1, p_hold=0.2, hold_count=2, seed=7,
        channels={"a"},
    )
    for k in range(200):
        chaos2.publish("a", k)
    chaos2.publish("b", "reliable")
    chaos2.flush()
    assert rec2.log == rec.log


@pytest.mark.slow
def test_vio_mission_survives_transport_chaos():
    """Full synthetic VIO mission through a faulty transport: 8% sensor drop,
    5% duplication, 5% reordering. The node must keep producing filter and
    smoother poses and land within a (loosened) accuracy band; any handler
    exception fails the test directly (synchronous delivery).

    Reference contract: state_estimator_lcm consumes best-effort LCM
    multicast (lcm_nodes/state_estimator_lcm.cpp) — sensor loss is an
    expected operating condition, not an error."""
    from ocean_perception_tpu.fabric.chaos import ChaosBus
    from ocean_perception_tpu.fabric.nodes.dataset_player import publish_sensors
    from ocean_perception_tpu.fabric.nodes.state_estimator_node import (
        StateEstimatorNode,
    )
    from ocean_perception_tpu.fabric.pubsub import InProcessBus

    tmp = tempfile.mkdtemp()
    write_synthetic_euroc(tmp, n_frames=16)
    shared_path = os.path.join(tmp, "shared.yaml")
    node_path = os.path.join(tmp, "node.yaml")
    with open(shared_path, "w") as f:
        f.write(SHARED_YAML)
    with open(node_path, "w") as f:
        f.write(NODE_YAML)

    bus = InProcessBus()
    node = StateEstimatorNode.from_config(bus, node_path, shared_path)
    filter_poses, smoother_poses = [], []
    bus.subscribe("vio/pose/filter", lambda _c, m: filter_poses.append(m))
    bus.subscribe("vio/pose/smoother", lambda _c, m: smoother_poses.append(m))

    chaos = ChaosBus(
        bus, p_drop=0.08, p_dup=0.05, p_hold=0.05, hold_count=4, seed=11,
        channels={"sensors/imu", "sensors/stereo", "sensors/depth"},
    )
    n = publish_sensors("euroc", tmp, chaos, speed=0.0)
    chaos.flush()
    assert n == 16
    s = chaos.stats
    assert s["dropped"] > 5 and s["duplicated"] > 3 and s["held"] > 3, s

    assert len(filter_poses) >= len(smoother_poses) >= 3, (
        len(filter_poses), len(smoother_poses),
    )
    last = smoother_poses[-1]
    t_last = last.timestamp * 1e-9
    true_x = x_of(t_last)
    est_x = float(last.pose[4])
    # Loosened vs the clean-transport band (test_process_fabric.py: 20%+5cm):
    # chaos costs accuracy, not liveness.
    assert abs(est_x - true_x) < 0.4 * true_x + 0.10, (est_x, true_x)
    assert abs(float(last.pose[5])) < 0.25
    assert abs(float(last.pose[6])) < 0.25
    del node

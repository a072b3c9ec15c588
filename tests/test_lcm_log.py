"""LCM log format: record / replay / dataset (lcm-logger & lcm-logplayer
parity — fabric/lcm_log.py, fabric/nodes/channel_logger.py,
datasets/lcm_log.py).

The binary layout tests pin the STANDARD LCM event format
(lcm/lcm_eventlog.c): logs must round-trip with stock LCM tooling in both
directions, so any layout change here is a wire break, not a refactor.
"""

import os
import struct
import time

import numpy as np
import pytest

from ocean_perception_tpu.fabric import lcm_types as lt
from ocean_perception_tpu.fabric import messages as ms
from ocean_perception_tpu.fabric.lcm_log import (
    BusRecorder,
    LcmLogReader,
    LcmLogWriter,
    LogEvent,
    log_summary,
    play_log,
)

LOG_TEST_PORT = 7985


# ---------------------------------------------------------------------------
# binary format
# ---------------------------------------------------------------------------


def test_event_binary_layout_is_standard_lcm(tmp_path):
    """Byte-for-byte golden: the exact layout lcm-logplayer expects."""
    path = str(tmp_path / "a.lcmlog")
    with LcmLogWriter(path) as w:
        w.write("CHAN", b"\x01\x02\x03", timestamp_us=1234567)

    raw = open(path, "rb").read()
    expected = struct.pack(">IQQII", 0xEDA1DA01, 0, 1234567, 4, 3) + b"CHAN" + b"\x01\x02\x03"
    assert raw == expected


def test_roundtrip_many_events(tmp_path):
    path = str(tmp_path / "b.lcmlog")
    events = [
        ("sensors/imu", bytes([i]) * (i + 1), 1000 + i) for i in range(20)
    ]
    with LcmLogWriter(path) as w:
        for ch, data, ts in events:
            w.write(ch, data, timestamp_us=ts)

    got = list(LcmLogReader(path))
    assert len(got) == 20
    for i, (ev, (ch, data, ts)) in enumerate(zip(got, events)):
        assert ev == LogEvent(i, ts, ch, data)


def test_reader_resyncs_past_corruption(tmp_path):
    path = str(tmp_path / "c.lcmlog")
    with LcmLogWriter(path) as w:
        for i in range(5):
            w.write(f"ch{i}", b"payload%d" % i, timestamp_us=i)

    # Corrupt event 2's sync word (torn write / bad sector).
    raw = bytearray(open(path, "rb").read())
    rec = struct.calcsize(">IQQII") + 3 + 8  # header + "chN" + payload
    raw[2 * rec] ^= 0xFF
    open(path, "wb").write(bytes(raw))

    got = list(LcmLogReader(path))
    # Event 2 is lost; 0, 1, 3, 4 survive the resync.
    assert [ev.eventnum for ev in got] == [0, 1, 3, 4]
    assert got[-1].data == b"payload4"


def test_truncated_final_event_is_dropped(tmp_path):
    path = str(tmp_path / "d.lcmlog")
    with LcmLogWriter(path) as w:
        w.write("a", b"x" * 100, timestamp_us=1)
        w.write("b", b"y" * 100, timestamp_us=2)
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[:-30])  # crash mid-write of event 1

    got = list(LcmLogReader(path))
    assert [ev.channel for ev in got] == ["a"]


def test_append_continues_event_numbering(tmp_path):
    path = str(tmp_path / "e.lcmlog")
    with LcmLogWriter(path) as w:
        w.write("a", b"1")
        w.write("a", b"2")
    with LcmLogWriter(path, append=True) as w:
        w.write("a", b"3")
    assert [ev.eventnum for ev in LcmLogReader(path)] == [0, 1, 2]


def test_read_at_offset(tmp_path):
    path = str(tmp_path / "f.lcmlog")
    with LcmLogWriter(path) as w:
        for i in range(4):
            w.write("c", bytes([i]), timestamp_us=i)
    with LcmLogReader(path) as r:
        offs = [(off, ev) for off, ev in r.events(with_offsets=True)]
        # Random access mid-iteration must not deadlock and must agree.
        for off, ev in offs:
            assert r.read_at(off) == ev


def test_log_summary(tmp_path):
    path = str(tmp_path / "g.lcmlog")
    imu = lt.IMU_MEASUREMENT_T.encode({
        "header": lt.make_header(5), "linear_acc": {"x": 0, "y": 0, "z": 9.81},
        "angular_vel": {"x": 0, "y": 0, "z": 0},
    })
    with LcmLogWriter(path) as w:
        w.write("sensors/imu", imu, timestamp_us=0)
        w.write("sensors/imu", imu, timestamp_us=1_000_000)
        w.write("weird", b"\0" * 16, timestamp_us=2_000_000)
    s = log_summary(path)
    assert s["events"] == 3
    assert s["duration_s"] == pytest.approx(2.0)
    assert s["channels"]["sensors/imu"]["count"] == 2
    assert s["channels"]["sensors/imu"]["type"] == "vehicle.imu_measurement_t"
    assert s["channels"]["weird"]["type"] == "unknown"


# ---------------------------------------------------------------------------
# bus record / replay
# ---------------------------------------------------------------------------


def _wait(cond, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.02)
    return cond()


def test_record_and_replay_on_lcm_wire(tmp_path):
    """Full loop on the real LCM transport: publish -> record (exact wire
    payloads) -> replay -> receive identical decoded messages."""
    from ocean_perception_tpu.fabric.lcm_wire import LcmUdpBus

    path = str(tmp_path / "session.lcmlog")
    tx = LcmUdpBus(port=LOG_TEST_PORT)
    rec_bus = LcmUdpBus(port=LOG_TEST_PORT)
    writer = LcmLogWriter(path)
    recorder = BusRecorder(rec_bus, writer, pattern=".*")
    time.sleep(0.1)

    sent = [
        ms.ImuMessage(100, np.array([0.1, 0.2, 0.3]), np.array([0.0, 0.0, 9.81])),
        ms.DepthMessage(200, 4.5),
        ms.RangeMessage(300, 12.0, np.array([1.0, 2.0, 3.0]), beacon_id=2),
        ms.MagMessage(400, np.array([0.3, 0.0, 0.4])),
    ]
    for m in sent:
        tx.publish("sensors/x", m)
    assert _wait(lambda: recorder.count >= len(sent))
    recorder.stop()
    writer.close()
    tx.close()
    rec_bus.close()

    # Replay onto a fresh wire and collect.
    got = []
    play_bus = LcmUdpBus(port=LOG_TEST_PORT + 1)
    rx = LcmUdpBus(port=LOG_TEST_PORT + 1)
    rx.subscribe("sensors/x", lambda ch, m: got.append(m))
    time.sleep(0.1)
    n = play_log(play_bus, path, speed=0.0)
    assert n == len(sent)
    assert _wait(lambda: len(got) >= len(sent))
    play_bus.close()
    rx.close()

    assert [type(m).__name__ for m in got] == [type(m).__name__ for m in sent]
    np.testing.assert_allclose(got[0].angular_velocity, sent[0].angular_velocity)
    assert got[1].depth == pytest.approx(4.5)
    assert got[2].beacon_id == 2
    np.testing.assert_allclose(got[3].field, sent[3].field)


def test_recorder_on_inprocess_bus_writes_lcm_format(tmp_path):
    """On the in-house transports the recorder re-encodes to LCM payloads:
    the log is standard format regardless of which bus carried the session."""
    from ocean_perception_tpu.fabric.pubsub import InProcessBus

    path = str(tmp_path / "h.lcmlog")
    bus = InProcessBus()
    writer = LcmLogWriter(path)
    recorder = BusRecorder(bus, writer, pattern="sensors/.*")
    bus.publish("sensors/imu", ms.ImuMessage(7, np.zeros(3), np.array([0.0, 0, 9.81])))
    bus.publish("viz/ignored", ms.DepthMessage(8, 1.0))  # filtered by pattern
    recorder.stop()
    writer.close()

    evs = list(LcmLogReader(path))
    assert len(evs) == 1 and recorder.count == 1
    sd, v = lt.decode_by_fingerprint(evs[0].data)
    assert sd is lt.IMU_MEASUREMENT_T
    assert v["header"]["timestamp"] == 7
    assert v["linear_acc"]["z"] == pytest.approx(9.81)


def test_play_log_decodes_for_custom_bus(tmp_path):
    """Playback onto a bus without publish_encoded decodes each event."""
    from ocean_perception_tpu.fabric.pubsub import InProcessBus

    path = str(tmp_path / "i.lcmlog")
    with LcmLogWriter(path) as w:
        w.write("sensors/depth", lt.DEPTH_MEASUREMENT_T.encode(
            {"header": lt.make_header(42), "depth": 3.25}), timestamp_us=0)
        w.write("foreign", b"\0" * 24, timestamp_us=1)  # unknown fingerprint

    bus = InProcessBus()
    got = []
    bus.subscribe("sensors/depth", lambda ch, m: got.append(m))
    n = play_log(bus, path, speed=0.0)
    assert n == 1  # the foreign event is skipped, not fatal
    assert len(got) == 1 and got[0].depth == pytest.approx(3.25)


# ---------------------------------------------------------------------------
# dataset over a log
# ---------------------------------------------------------------------------


def _small_stereo(ts, w=12, h=8):
    rng = np.random.default_rng(ts)
    def img():
        u8 = rng.integers(0, 255, (h, w), np.uint8)
        return ms.ImageMessage(ts, w, h, 1, "u8", u8.tobytes())
    return ms.StereoImageMessage(ts, 0, img(), img())


def _write_mission_log(path):
    """A tiny session: imu @ 10 ms, depth @ 50 ms, stereo @ 100 ms, one
    init pose — written out of channel order like a real multi-publisher
    session (per-channel publishers interleave on receive time)."""
    from ocean_perception_tpu.fabric.lcm_wire import to_lcm

    events = []
    events.append(("vio/init_pose", ms.PoseStampedMessage(
        0, pose=np.array([1.0, 0, 0, 0, 0.5, -0.25, 2.0]))))
    for i in range(30):
        events.append(("sensors/imu", ms.ImuMessage(
            i * 10_000_000, np.zeros(3), np.array([0.0, 0, 9.81]))))
    for i in range(6):
        events.append(("sensors/depth", ms.DepthMessage(i * 50_000_000, 2.0 + i)))
    for i in range(3):
        events.append(("sensors/stereo", _small_stereo(i * 100_000_000 + 1)))

    with LcmLogWriter(path) as w:
        for ch, m in events:
            sd, v = to_lcm(m)
            w.write(ch, sd.encode(v), timestamp_us=m.timestamp // 1000)
    return events


def test_lcm_log_dataset(tmp_path):
    from ocean_perception_tpu.datasets.lcm_log import LcmLogDataset

    path = str(tmp_path / "mission.lcmlog")
    _write_mission_log(path)

    ds = LcmLogDataset(path)
    assert len(ds.imu_data) == 30
    assert len(ds.depth_data) == 6
    assert len(ds.stereo_data) == 3
    assert len(ds.pose_data) == 1
    np.testing.assert_allclose(ds.pose_data[0].world_T_body[:3, 3], [0.5, -0.25, 2.0])

    order = []
    frames = []
    ds.register_imu_callback(lambda m: order.append(("imu", m.timestamp)))
    ds.register_depth_callback(lambda m: order.append(("depth", m.timestamp)))
    ds.register_stereo_callback(lambda im: (order.append(("stereo", im.timestamp)),
                                            frames.append(im)))
    n = ds.play_all()
    assert n == 30 + 6 + 3 + 1
    # Chronological dispatch with the DataSource tie priority (IMU < DEPTH
    # < STEREO at equal stamps).
    stamps = [t for _, t in order]
    assert stamps == sorted(stamps)

    # Frames decode lazily from the log to load_image conventions.
    im = frames[0]
    assert im.left.shape == (8, 12) and im.left.dtype == np.float32
    assert 0.0 <= im.left.min() and im.left.max() <= 1.0
    ds.shutdown()


def test_lcm_log_dataset_skips_estimator_output_poses(tmp_path):
    """A full-session log includes the estimator's own pose output; the
    dataset must replay mission INPUTS only."""
    from ocean_perception_tpu.datasets.lcm_log import LcmLogDataset
    from ocean_perception_tpu.fabric.lcm_wire import to_lcm

    path = str(tmp_path / "full.lcmlog")
    with LcmLogWriter(path) as w:
        for ch in ("vio/init_pose", "vio/pose", "vio/smoother_pose"):
            sd, v = to_lcm(ms.PoseStampedMessage(
                5, pose=np.array([1.0, 0, 0, 0, 0, 0, 0])))
            w.write(ch, sd.encode(v), timestamp_us=0)

    ds = LcmLogDataset(path)
    assert len(ds.pose_data) == 1  # only init_pose matched the gt pattern
    assert sum(ds.skipped.values()) == 0  # non-gt poses ignored silently
    ds.shutdown()


def test_dataset_player_runs_from_log(tmp_path):
    """get_dataset_by_name('lcmlog', ...) wires into the standard player."""
    from ocean_perception_tpu.datasets import get_dataset_by_name

    path = str(tmp_path / "m2.lcmlog")
    _write_mission_log(path)
    ds = get_dataset_by_name("lcmlog", path)
    seen = []
    ds.register_stereo_callback(lambda im: seen.append(im.timestamp))
    ds.playback(speed=50.0, block=True)
    assert len(seen) == 3
    ds.shutdown()


def test_channel_logger_cli_info_and_play(tmp_path, capsys):
    """The ocean-channel-logger CLI: info summarizes; play re-publishes."""
    from ocean_perception_tpu.fabric.nodes.channel_logger import main
    from ocean_perception_tpu.fabric.lcm_wire import LcmUdpBus

    path = str(tmp_path / "cli.lcmlog")
    _write_mission_log(path)

    assert main(["info", "--path", path]) == 0
    out = capsys.readouterr().out
    assert "sensors/imu" in out and "vehicle.imu_measurement_t" in out

    port = LOG_TEST_PORT + 3
    rx = LcmUdpBus(port=port)
    got = []
    rx.subscribe("sensors/imu", lambda _c, m: got.append(m))
    time.sleep(0.1)
    assert main([
        "play", "--path", path, "--lcm", "--port", str(port),
        "--speed", "0", "--pattern", "sensors/imu", "--max-events", "10",
    ]) == 0
    assert _wait(lambda: len(got) >= 10)
    rx.close()
    assert got[0].timestamp == 0 and len(got) == 10


@pytest.mark.slow
def test_mission_from_log_matches_mission_from_files(tmp_path):
    """End-to-end loop closure: a synthetic EuRoC mission is published on a
    bus, recorded to an LCM log, and the FULL estimator is run twice — once
    from the original files, once from the recorded log. The wire+log
    round trip must be lossless for every sensor stream: the two smoothed
    trajectories agree to float tolerance."""
    from synthetic_vio import BASELINE, FX, H, W, write_synthetic_euroc
    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.fabric.nodes.dataset_player import publish_sensors, run
    from ocean_perception_tpu.fabric.pubsub import InProcessBus
    from ocean_perception_tpu.tracking import (
        DetectorParams, LKParams, StripeMatcherParams,
    )
    from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerParams
    from ocean_perception_tpu.vio.odometry import OdometryParams
    from ocean_perception_tpu.vio.smoother import SmootherConfig
    from ocean_perception_tpu.vio.state_estimator import StateEstimatorParams
    from ocean_perception_tpu.vio.stereo_frontend import FrontendParams

    root = str(tmp_path / "euroc")
    write_synthetic_euroc(root, n_frames=10)

    # Record the session (sensor publish path -> LCM-format log). The f32
    # wire frames quantize to mono8 on the LCM re-encode; the source frames
    # are PNG-backed u8, so the round trip is bit-exact.
    log_path = str(tmp_path / "mission.lcmlog")
    bus = InProcessBus()
    writer = LcmLogWriter(log_path)
    recorder = BusRecorder(bus, writer)
    n = publish_sensors("euroc", root, bus, speed=0.0)
    recorder.stop()
    writer.close()
    assert n == 10 and recorder.dropped == 0

    cam = PinholeCamera.create(FX, FX, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, BASELINE)

    def params():
        return StateEstimatorParams(
            n_gravity=np.array([0.0, 0.0, -9.81]),
            frontend=FrontendParams(
                tracker=StereoTrackerParams(
                    capacity=96,
                    detector=DetectorParams(max_features=96, min_distance=10, border=10),
                    lk=LKParams(max_level=2),
                    matcher=StripeMatcherParams(
                        max_disp=32, templ_cols=15, templ_rows=11, max_matching_cost=0.3
                    ),
                    trigger_keyframe_k=2,
                ),
                odometry=OdometryParams(),
                pixel_sigma=1.0,
            ),
            smoother=SmootherConfig(window=8, iterations=5),
            min_sec_btw_keyposes=0.15,
            max_sec_btw_keyposes=10.0,
        )

    traj_files = run("euroc", root, rig=rig, params=params())
    traj_log = run("lcmlog", log_path, rig=rig, params=params())

    assert len(traj_files) > 0
    assert len(traj_log) == len(traj_files)
    for a, b in zip(traj_files, traj_log):
        assert a.timestamp == b.timestamp
        np.testing.assert_allclose(
            a.world_T_body, b.world_T_body, rtol=0, atol=1e-6
        )

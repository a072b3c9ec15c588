"""Dataset loaders, playback merge order, messages, pub/sub, shm transport."""

import os
import threading
import time

import numpy as np
import pytest

from ocean_perception_tpu.core.measurements import (
    DepthMeasurement,
    GroundtruthPose,
    ImuMeasurement,
    RangeMeasurement,
)
from ocean_perception_tpu.datasets import (
    DataProvider,
    EurocDataset,
    EurocDataWriter,
    FolderStereoDataset,
    get_dataset_by_name,
)
from ocean_perception_tpu.datasets.base import DataSource, StereoDatasetItem
from ocean_perception_tpu.fabric import (
    DepthMessage,
    ImuMessage,
    ImageMessage,
    InProcessBus,
    MeshMessage,
    PoseStampedMessage,
    RangeMessage,
    ShmImageHeader,
    StereoImageMessage,
    UdpMulticastBus,
    decode_message,
    encode_message,
    native_available,
)
from ocean_perception_tpu.utils.image_io import save_image


def write_mini_euroc(root, n_frames=3, n_imu=20):
    """Generate a tiny EuRoC-layout dataset on disk."""
    rng = np.random.default_rng(0)
    mav0 = os.path.join(root, "mav0")
    for sub in ("cam0/data", "cam1/data", "imu0", "depth0", "aps0"):
        os.makedirs(os.path.join(mav0, sub), exist_ok=True)

    cam_rows = []
    for i in range(n_frames):
        ts = int((i + 1) * 1e8)
        img = rng.random((24, 32)).astype(np.float32)
        for cam in ("cam0", "cam1"):
            save_image(os.path.join(mav0, cam, "data", f"{ts}.png"), img)
        cam_rows.append(f"{ts},{ts}.png")
    for cam in ("cam0", "cam1"):
        with open(os.path.join(mav0, cam, "data.csv"), "w") as f:
            f.write("#timestamp [ns],filename\n" + "\n".join(cam_rows) + "\n")

    with open(os.path.join(mav0, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp,...\n")
        for i in range(n_imu):
            ts = int((i + 1) * 2e7)
            f.write(f"{ts},0.01,0.02,-0.01,0.1,-9.81,0.2\n")

    with open(os.path.join(mav0, "imu0_poses.txt"), "w") as f:
        f.write("100000000,1,0,0,0,0.5,0.2,-0.1\n")

    with open(os.path.join(mav0, "depth0", "data.csv"), "w") as f:
        f.write("#timestamp,depth\n100000000,2.5\n300000000,2.6\n")

    with open(os.path.join(mav0, "aps0", "data.csv"), "w") as f:
        f.write("#timestamp,range,bx,by,bz\n150000000,10.5,1,2,3\n")


def test_euroc_roundtrip(tmp_path):
    write_mini_euroc(str(tmp_path))
    ds = EurocDataset(str(tmp_path))
    assert len(ds.stereo_data) == 3
    assert len(ds.imu_data) == 20
    assert len(ds.depth_data) == 2
    assert len(ds.range_data) == 1
    assert len(ds.pose_data) == 1
    np.testing.assert_allclose(ds.pose_data[0].world_T_body[:3, 3], [0.5, 0.2, -0.1])
    np.testing.assert_allclose(ds.imu_data[0].linear_acceleration, [0.1, -9.81, 0.2])


def test_dataset_merge_order(tmp_path):
    """Tie priority IMU > DEPTH > RANGE > STEREO (data_provider.cpp:53-62)."""
    ds = DataProvider()
    t = 100
    ds.imu_data = [ImuMeasurement(t, np.zeros(3), np.zeros(3))]
    ds.depth_data = [DepthMeasurement(t, 1.0)]
    ds.range_data = [RangeMeasurement(t, 2.0, np.zeros(3))]
    order = []
    ds.register_imu_callback(lambda m: order.append("imu"))
    ds.register_depth_callback(lambda m: order.append("depth"))
    ds.register_range_callback(lambda m: order.append("range"))
    while ds.step():
        pass
    assert order == ["imu", "depth", "range"]


def test_dataset_playback_speed(tmp_path):
    ds = DataProvider()
    ds.imu_data = [
        ImuMeasurement(int(i * 5e7), np.zeros(3), np.zeros(3)) for i in range(1, 6)
    ]  # 0.05s apart => 0.2s span
    seen = []
    ds.register_imu_callback(lambda m: seen.append(m.timestamp))
    t0 = time.perf_counter()
    ds.playback(speed=4.0, block=True)  # 0.2s / 4 = 0.05s
    dt = time.perf_counter() - t0
    assert len(seen) == 5
    assert dt < 0.5


def test_euroc_writer_reader_roundtrip(tmp_path):
    w = EurocDataWriter(str(tmp_path))
    rng = np.random.default_rng(1)
    for i in range(2):
        ts = int((i + 1) * 1e8)
        w.write_stereo(ts, rng.random((16, 16)).astype(np.float32), rng.random((16, 16)).astype(np.float32))
        w.write_imu(ImuMeasurement(ts, np.ones(3) * 0.1, np.array([0, -9.8, 0])))
        w.write_depth(DepthMeasurement(ts, 1.5))
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, -0.2 * i, 0.05]
        T[:3, :3] = np.array(
            [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
        )  # yaw 90 deg: exercises the quaternion roundtrip
        w.write_groundtruth(GroundtruthPose(ts, T))
    w.finish()
    ds = EurocDataset(str(tmp_path))
    assert len(ds.stereo_data) == 2 and len(ds.imu_data) == 2 and len(ds.depth_data) == 2
    assert len(ds.pose_data) == 2
    np.testing.assert_allclose(ds.pose_data[1].world_T_body[:3, 3], [0.1, -0.2, 0.05], atol=1e-9)
    np.testing.assert_allclose(
        ds.pose_data[1].world_T_body[:3, :3],
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
        atol=1e-6,
    )


def test_folder_dataset(tmp_path):
    for side in ("left", "right"):
        os.makedirs(tmp_path / side)
        for i in range(3):
            save_image(str(tmp_path / side / f"{i:03d}.png"), np.random.rand(8, 8).astype(np.float32))
    ds = get_dataset_by_name("himb", str(tmp_path))
    assert len(ds.stereo_data) == 3
    # Synthesized 10 Hz timestamps.
    assert ds.stereo_data[1].timestamp - ds.stereo_data[0].timestamp == 100_000_000


class TestMessages:
    def test_image_roundtrip(self):
        img = np.random.rand(10, 12).astype(np.float32)
        m = ImageMessage.from_array(123, img)
        back = decode_message(encode_message(m))
        np.testing.assert_allclose(back.to_array(), img)
        assert back.timestamp == 123

    def test_stereo_roundtrip(self):
        l = np.random.rand(6, 8).astype(np.float32)
        r = np.random.rand(6, 8).astype(np.float32)
        m = StereoImageMessage(5, 1, ImageMessage.from_array(5, l), ImageMessage.from_array(5, r))
        back = decode_message(encode_message(m))
        np.testing.assert_allclose(back.left.to_array(), l)
        np.testing.assert_allclose(back.right.to_array(), r)

    def test_sensor_messages_roundtrip(self):
        for m in [
            ImuMessage(1, np.array([0.1, 0.2, 0.3]), np.array([1.0, 2.0, 3.0])),
            DepthMessage(2, 4.5),
            RangeMessage(3, 9.9, np.array([1.0, 2, 3]), 2),
            ShmImageHeader(4, 64, 48, 1, 77, "/tmp/ring"),
            PoseStampedMessage(5, "world", np.array([1.0, 0, 0, 0, 1, 2, 3]), np.eye(6)),
            MeshMessage(6, np.random.rand(4, 3).astype(np.float32), np.array([[0, 1, 2]], np.int32)),
        ]:
            back = decode_message(encode_message(m))
            assert type(back) is type(m)
            assert back.timestamp == m.timestamp

    def test_pose_covariance(self):
        cov = np.arange(36, dtype=np.float64).reshape(6, 6)
        m = PoseStampedMessage(9, "map", np.array([1.0, 0, 0, 0, 0, 0, 0]), cov)
        back = decode_message(encode_message(m))
        np.testing.assert_allclose(back.covariance, cov)
        assert back.frame_id == "map"


def test_inprocess_bus():
    bus = InProcessBus()
    got = []
    bus.subscribe("chan/a", lambda ch, m: got.append((ch, m)))
    bus.publish("chan/a", DepthMessage(1, 2.0))
    bus.publish("chan/b", DepthMessage(2, 3.0))  # not subscribed
    assert len(got) == 1
    assert got[0][1].depth == 2.0


def test_udp_bus_loopback():
    bus = UdpMulticastBus(port=17667)
    got = []
    event = threading.Event()

    def cb(ch, m):
        got.append(m)
        event.set()

    bus.subscribe("test/depth", cb)
    time.sleep(0.1)
    bus.publish("test/depth", DepthMessage(42, 7.5))
    assert event.wait(timeout=2.0), "UDP message not received"
    assert got[0].depth == 7.5
    bus.close()


def test_udp_bus_fragmentation():
    bus = UdpMulticastBus(port=17668)
    got = []
    event = threading.Event()
    bus.subscribe("test/img", lambda ch, m: (got.append(m), event.set()))
    time.sleep(0.1)
    img = np.random.rand(200, 200).astype(np.float32)  # 160 KB > 1 datagram
    bus.publish("test/img", ImageMessage.from_array(7, img))
    assert event.wait(timeout=3.0), "fragmented message not reassembled"
    np.testing.assert_allclose(got[0].to_array(), img)
    bus.close()


@pytest.mark.skipif(not native_available(), reason="native fabric lib unavailable")
def test_shm_ring(tmp_path):
    from ocean_perception_tpu.fabric import ShmRingReader, ShmRingWriter

    path = str(tmp_path / "frames.ring")
    w = ShmRingWriter(path, n_slots=4, slot_bytes=1 << 16)
    r = ShmRingReader(path)
    img = np.random.rand(32, 48).astype(np.float32)
    seq = w.write(999, img)
    ts, back = r.read(seq)
    assert ts == 999
    np.testing.assert_allclose(back, img)
    # u8 images too.
    img8 = (np.random.rand(16, 16) * 255).astype(np.uint8)
    ts2, back2 = r.read(w.write(1000, img8))
    np.testing.assert_array_equal(back2, img8)
    # Lapped frames return None.
    seqs = [w.write(i, img8) for i in range(8)]
    assert r.read(seqs[0]) is None
    w.close()
    r.close()


def test_native_udp_bus_interop(rng):
    """The C++ transport (fabric/native/udp_bus.cpp) is byte-compatible with
    the Python UdpMulticastBus: native->python and python->native round
    trips, including a fragmented (image-sized) payload."""
    from ocean_perception_tpu.fabric.messages import ImageMessage, ImuMessage
    from ocean_perception_tpu.fabric.native_bus import NativeUdpBus, native_available
    from ocean_perception_tpu.fabric.pubsub import UdpMulticastBus

    if not native_available():
        pytest.skip("native fabric library unavailable")
    port = 7913
    native = NativeUdpBus(port=port)
    py = UdpMulticastBus(port=port)
    try:
        got_py, got_native = [], []
        py.subscribe("chan/a", lambda _c, m: got_py.append(m))
        native.subscribe("chan/b", lambda _c, m: got_native.append(m))
        time.sleep(0.3)  # both rx threads up

        # native -> python (small message)
        native.publish("chan/a", ImuMessage(7, np.zeros(3), np.array([1.0, 2.0, 3.0])))
        # python -> native (fragmented: 160x200 f32 image = ~128 KB > 60 KB)
        img = rng.random((160, 200)).astype(np.float32)
        py.publish("chan/b", ImageMessage.from_array(5, img))

        deadline = time.time() + 5
        while time.time() < deadline and not (got_py and got_native):
            time.sleep(0.05)
        assert got_py, "python peer never received the native message"
        assert got_native, "native peer never received the fragmented message"
        np.testing.assert_allclose(got_py[0].linear_acceleration, [1.0, 2.0, 3.0])
        np.testing.assert_allclose(got_native[0].to_array(), img)

        # native -> native fragmented round trip
        got2 = []
        native.subscribe("chan/c", lambda _c, m: got2.append(m))
        time.sleep(0.1)
        native.publish("chan/c", ImageMessage.from_array(9, img))
        deadline = time.time() + 5
        while time.time() < deadline and not got2:
            time.sleep(0.05)
        assert got2 and np.allclose(got2[0].to_array(), img)
    finally:
        native.close()
        py.close()

import dataclasses
import threading

import numpy as np
import pytest

from ocean_perception_tpu.core import time as ctime
from ocean_perception_tpu.core.buffers import (
    DataManager,
    ItemHistory,
    SlidingBuffer,
    ThreadsafeQueue,
)
from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.core.uids import UidGenerator


@dataclasses.dataclass
class Stamped:
    timestamp: int
    value: float = 0.0


def test_time_conversions():
    assert ctime.to_seconds(1_500_000_000) == 1.5
    assert ctime.to_timestamp(2.25) == 2_250_000_000
    assert ctime.to_timestamp(ctime.to_seconds(123456789)) == 123456789


def test_uid_generator_threaded():
    gen = UidGenerator()
    out = []
    lock = threading.Lock()

    def worker():
        for _ in range(100):
            v = gen.next()
            with lock:
                out.append(v)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert len(set(out)) == 400


def test_threadsafe_queue_drop_oldest():
    q = ThreadsafeQueue(max_size=3)
    for i in range(5):
        q.push(i)
    assert q.size() == 3
    assert q.pop() == 2  # 0 and 1 dropped
    assert q.pop() == 3


def test_data_manager_semantics():
    """Parity: core/data_manager_test.cpp behaviors."""
    dm = DataManager(max_size=10)
    for t in [10, 20, 30, 40]:
        assert dm.push(Stamped(t))
    assert not dm.push(Stamped(25))  # non-monotonic rejected
    assert dm.oldest_timestamp() == 10
    assert dm.newest_timestamp() == 40

    popped = dm.pop_until(25)
    assert [s.timestamp for s in popped] == [10, 20]

    dm.discard_before(40)
    assert dm.oldest_timestamp() == 40
    dm.discard_before(40, inclusive=True)
    assert dm.empty()


def test_sliding_buffer():
    buf = SlidingBuffer(3)
    for i in range(5):
        buf.add(i)
    assert buf.head() == 4
    assert buf.get(1) == 3
    assert buf.get(2) == 2
    assert buf.full()


def test_item_history_rewind():
    hist = ItemHistory(lag_seconds=1.0)
    for t in range(0, 10):
        hist.add(t * 100_000_000, f"s{t}")  # 0.1 s apart
    t, item = hist.closest_before(450_000_000)
    assert item == "s4" and t == 400_000_000
    hist.discard_after(450_000_000)
    assert hist.newest()[1] == "s4"
    # Lag eviction: only ~1 s of history retained.
    hist2 = ItemHistory(lag_seconds=0.35)
    for t in range(0, 10):
        hist2.add(t * 100_000_000, t)
    assert hist2.closest_before(0) is None or hist2.closest_before(0)[0] >= 0


def test_pinhole_project_backproject():
    cam = PinholeCamera.create(fx=300.0, fy=310.0, cx=320.0, cy=240.0, height=480, width=640)
    pts = np.array([[0.5, -0.2, 2.0], [0.0, 0.0, 1.0], [-1.0, 1.5, 5.0]], dtype=np.float32)
    uv = cam.project(pts)
    np.testing.assert_allclose(uv[1], [320.0, 240.0], atol=1e-5)
    back = cam.backproject(uv, pts[:, 2])
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_pinhole_rescale():
    cam = PinholeCamera.create(300.0, 300.0, 320.0, 240.0, 480, 640)
    half = cam.rescale(0.5)
    assert half.width == 320 and half.height == 240
    np.testing.assert_allclose(half.fx, 150.0)


def test_stereo_depth_disp_roundtrip():
    cam = PinholeCamera.create(300.0, 300.0, 320.0, 240.0, 480, 640)
    rig = StereoCamera.create(cam, cam, baseline=0.2)
    disp = np.array([1.0, 10.0, 60.0], dtype=np.float32)
    depth = rig.disp_to_depth(disp)
    np.testing.assert_allclose(rig.depth_to_disp(depth), disp, rtol=1e-5)
    assert np.isinf(rig.disp_to_depth(np.float32(0.0)))

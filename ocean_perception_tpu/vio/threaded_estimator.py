"""Threaded StateEstimator wrapper — the reference's concurrency shape.

Reference parity: vio/state_estimator.cpp spawns three workers (frontend /
smoother / filter, :133-138) fed by ThreadsafeQueues with drop-oldest
backpressure. In the rebuild the *numerics* live in the deterministic
synchronous ``StateEstimator``; this wrapper restores the asynchronous
process shape for live operation: a vision thread (frontend+smoother path,
~frame rate) and a filter thread (IMU-rate) drain bounded queues, so a slow
smoother solve never blocks sensor ingest (queue drop policy == reference
backpressure).
"""

from __future__ import annotations

import threading
from typing import Optional

from ..core.buffers import ThreadsafeQueue
from ..core.cameras import StereoCamera
from ..core.measurements import (
    DepthMeasurement,
    ImuMeasurement,
    MagMeasurement,
    RangeMeasurement,
    StereoImage,
)
from .state_estimator import StateEstimator, StateEstimatorParams


class ThreadedStateEstimator:
    def __init__(self, params: StateEstimatorParams, rig: StereoCamera,
                 stereo_queue_size: int = 4, imu_queue_size: int = 1000):
        self.core = StateEstimator(params, rig)
        self._stereo_q: ThreadsafeQueue[StereoImage] = ThreadsafeQueue(stereo_queue_size)
        self._fast_q: ThreadsafeQueue[object] = ThreadsafeQueue(imu_queue_size)
        self._lock = threading.Lock()  # serializes core access between workers
        self._shutdown = threading.Event()
        self._threads = []

    # -- lifecycle -------------------------------------------------------------

    def initialize(self, timestamp: int, world_T_body) -> None:
        with self._lock:
            self.core.initialize(timestamp, world_T_body)
        for target, name in ((self._vision_loop, "vision"), (self._filter_loop, "filter")):
            t = threading.Thread(target=target, name=f"estimator-{name}", daemon=True)
            t.start()
            self._threads.append(t)

    def shutdown(self) -> None:
        self._shutdown.set()
        for t in self._threads:
            t.join(timeout=5)

    def wait_idle(self, timeout: float = 30.0) -> bool:
        """Block until both queues drain (for deterministic tests)."""
        import time

        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            if self._stereo_q.empty() and self._fast_q.empty():
                return True
            time.sleep(0.005)
        return False

    # -- ingest (non-blocking; drop-oldest on overflow) -------------------------

    def receive_stereo(self, m: StereoImage) -> None:
        self._stereo_q.push(m)

    def receive_imu(self, m: ImuMeasurement) -> None:
        self._fast_q.push(m)

    def receive_depth(self, m: DepthMeasurement) -> None:
        self._fast_q.push(m)

    def receive_range(self, m: RangeMeasurement) -> None:
        self._fast_q.push(m)

    def receive_mag(self, m: MagMeasurement) -> None:
        self._fast_q.push(m)

    # -- workers ----------------------------------------------------------------

    def _vision_loop(self) -> None:
        while not self._shutdown.is_set():
            m = self._stereo_q.pop(timeout=0.1)
            if m is None:
                continue
            with self._lock:
                self.core.receive_stereo(m)

    def _filter_loop(self) -> None:
        while not self._shutdown.is_set():
            m = self._fast_q.pop(timeout=0.1)
            if m is None:
                continue
            with self._lock:
                if isinstance(m, ImuMeasurement):
                    self.core.receive_imu(m)
                elif isinstance(m, DepthMeasurement):
                    self.core.receive_depth(m)
                elif isinstance(m, RangeMeasurement):
                    self.core.receive_range(m)
                elif isinstance(m, MagMeasurement):
                    self.core.receive_mag(m)

    # -- outputs ---------------------------------------------------------------

    @property
    def smoother_callbacks(self):
        return self.core.smoother_callbacks

    @property
    def filter_callbacks(self):
        return self.core.filter_callbacks

    def filter_state(self):
        with self._lock:
            return self.core.filter_state()

    def smoother_state(self):
        with self._lock:
            return self.core.smoother_state()

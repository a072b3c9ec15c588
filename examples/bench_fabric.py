#!/usr/bin/env python
"""Fabric transport benchmark: message throughput of the four buses.

Measures publish→deliver rate on multicast loopback for a small sensor
message (imu-sized) and a large fragmented one (720p grayscale stereo
frame), for each transport:

- UdpMulticastBus (pure Python, in-house wire)
- NativeUdpBus    (C++ transport, in-house wire)
- LcmUdpBus       (pure Python, REAL LCM wire + lcmtypes encoding)
- NativeLcmBus    (C++ transport, REAL LCM wire + lcmtypes encoding)

Usage: python examples/bench_fabric.py [--small 2000] [--large 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocean_perception_tpu.fabric import messages as ms  # noqa: E402

PORT = 7941


def run_one(name, bus_cls, n_small, n_large):
    tx = bus_cls(port=PORT)
    rx = bus_cls(port=PORT)
    got = {"n": 0}
    try:
        rx.subscribe("bench", lambda ch, m: got.update(n=got["n"] + 1))
        time.sleep(0.2)

        imu = ms.ImuMessage(1, np.zeros(3), np.array([0.0, 0.0, -9.81]))
        t0 = time.perf_counter()
        for i in range(n_small):
            tx.publish("bench", imu)
        while got["n"] < n_small and time.perf_counter() - t0 < 30:
            time.sleep(0.005)
        dt_small = time.perf_counter() - t0
        small_rate = got["n"] / dt_small
        small_loss = 1 - got["n"] / n_small

        frame = np.zeros((720, 1280), np.float32)
        frame[::7, ::5] = 1.0
        stereo = ms.StereoImageMessage(
            2, 0, ms.ImageMessage.from_array(2, frame), ms.ImageMessage.from_array(2, frame)
        )
        got["n"] = 0
        t0 = time.perf_counter()
        for i in range(n_large):
            tx.publish("bench", stereo)
            time.sleep(0.002)  # let the rx thread drain the fragment bursts
        while got["n"] < n_large and time.perf_counter() - t0 < 30:
            time.sleep(0.01)
        dt_large = time.perf_counter() - t0
        large_rate = got["n"] / dt_large
        large_loss = 1 - got["n"] / n_large

        print(
            f"  {name:16s} small: {small_rate:8.0f} msg/s (loss {small_loss:5.1%})   "
            f"stereo-720p: {large_rate:6.1f} fps (loss {large_loss:5.1%})",
            flush=True,
        )
    finally:
        tx.close()
        rx.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=2000)
    ap.add_argument("--large", type=int, default=30)
    args = ap.parse_args()

    from ocean_perception_tpu.fabric.lcm_wire import LcmUdpBus
    from ocean_perception_tpu.fabric.native_bus import (
        NativeLcmBus,
        NativeUdpBus,
        native_available,
    )
    from ocean_perception_tpu.fabric.pubsub import UdpMulticastBus

    buses = [("UdpMulticastBus", UdpMulticastBus), ("LcmUdpBus", LcmUdpBus)]
    if native_available():
        buses += [("NativeUdpBus", NativeUdpBus), ("NativeLcmBus", NativeLcmBus)]

    print(f"multicast loopback, {args.small} small msgs / {args.large} stereo frames:")
    for name, cls in buses:
        run_one(name, cls, args.small, args.large)

    # Zero-copy reference point: the shm ring (descriptor on the bus, pixels
    # through the seqlock ring) — the reference's mmf transport role.
    import tempfile

    from ocean_perception_tpu.fabric.shm_ring import ShmRingReader, ShmRingWriter

    frame = np.zeros((720, 1280), np.float32)
    path = os.path.join(tempfile.mkdtemp(), "ring.shm")
    w = ShmRingWriter(path)
    r = ShmRingReader(path)
    n = max(args.large * 10, 100)
    t0 = time.perf_counter()
    ok = 0
    for i in range(n):
        seq = w.write(i, frame)
        got = r.read(seq)
        ok += got is not None
    dt = time.perf_counter() - t0
    print(f"  {'ShmRing (native)':16s} stereo-720p single image: {n / dt:8.1f} fps "
          f"write+read ({ok}/{n} reads ok)")


if __name__ == "__main__":
    main()

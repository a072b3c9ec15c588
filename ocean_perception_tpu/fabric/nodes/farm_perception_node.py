"""Farm perception node: N synchronized stereo cameras → ONE batched TPU
step → per-camera enhanced frames + obstacle meshes.

The BASELINE north star is a static multi-camera sensor package ("farm
package") — the reference runs one object_mesher_lcm PROCESS per camera and
lets the GPU time-slice them (object_mesher_lcm.cpp is single-stream).
TPU-first, the N streams are a leading batch axis of a single jitted
program (parallel/sharded_pipeline.multi_camera_frontend_step): one
dispatch per fleet frame runs enhance → disparity → depth → feature
tracking → landmark clustering for every camera, camera axis sharded over
whatever mesh is available (1 chip: vmap; N chips: ICI, zero collectives in
the forward path). Measured operating point (docs/PERFORMANCE.md round 3):
4x720p cameras at internal_scale=4 sustain 114.8 fps/camera on one chip.

Batching policy: frames are collected per camera and a fleet step fires
when every camera has a fresh frame (static packages are hardware- or
sim-synchronized), or when the oldest waiting frame exceeds
``max_sync_wait_sec`` — a dead camera must not stall the fleet (SURVEY §5.3
failure-detection stance). Stale slots are filled with the camera's last
frame so shapes stay static; their outputs are simply not re-published.
"""

from __future__ import annotations

import argparse
import sys
import threading
import time
from typing import Dict, List, Optional

import numpy as np

from ...core.cameras import PinholeCamera, StereoCamera
from ..messages import ImageMessage, MeshMessage, StereoImageMessage
from ..pubsub import PubSub, UdpMulticastBus


def _wire_frame(img) -> np.ndarray:
    """Decode a wire image with the SMALLEST host representation: u8 stays
    u8 and mono stays single-channel — the batched step casts to float and
    broadcasts channels ON DEVICE (sharded_pipeline._prep), so a u8 mono
    720p frame ships 0.9 MB host->device instead of 11 MB. Float payloads
    pass through as float32."""
    u8 = img.to_array_u8()
    return u8 if u8 is not None else np.asarray(img.to_array(), np.float32)


def _as_rgb_f32(arr: np.ndarray) -> np.ndarray:
    """Fallback normalization when a fleet batch mixes dtypes/layouts."""
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=2)
    return arr


class FarmPerceptionNode:
    def __init__(
        self,
        bus: PubSub,
        rig: StereoCamera,
        n_cameras: int = 4,
        perception_config=None,
        mesher_params=None,
        channel_input: str = "sensors/stereo/cam{i}",
        channel_output_mesh: str = "farm/mesh/cam{i}",
        channel_output_enhanced: Optional[str] = None,  # e.g. "farm/enhanced/cam{i}"
        max_sync_wait_sec: float = 0.5,
        disparity_scale: float = 1.0,
        vertex_min_obs: int = 3,
        mesher_scale: int = 1,
    ):
        from ...mesher.object_mesher import ObjectMesherDeviceParams
        from ...models.perception import PerceptionConfig
        from ...parallel.mesh import make_mesh
        from ...parallel.sharded_pipeline import create_fleet_frontend_state

        self.bus = bus
        self.rig = rig
        self.n_cameras = n_cameras
        self.config = perception_config or PerceptionConfig()
        self.mesher_params = mesher_params or ObjectMesherDeviceParams()
        self.channel_output_mesh = channel_output_mesh
        self.channel_output_enhanced = channel_output_enhanced
        self.max_sync_wait_sec = max_sync_wait_sec
        self.disparity_scale = disparity_scale
        self.vertex_min_obs = vertex_min_obs

        # Camera axis shards over the devices when it divides evenly;
        # otherwise everything rides one device (vmap semantics either way).
        import jax

        n_dev = len(jax.devices())
        self.mesh = make_mesh(n_dev if n_cameras % max(n_dev, 1) == 0 else 1)

        H, W = int(rig.left.height), int(rig.left.width)
        self._image_shape = (H, W)
        # Tracking/mesher at 1/mesher_scale resolution (the reference mesher
        # node's mesher_input_height downscale; see the fleet ablation in
        # docs/PERFORMANCE.md — the tracking path dominates at 720p B=4).
        # Back-projection then uses the RESCALED rig.
        self.mesher_scale = int(mesher_scale)
        s = self.mesher_scale
        self._mesher_rig = rig.rescale(1.0 / s) if s > 1 else rig
        self._states, self._graphs = create_fleet_frontend_state(
            n_cameras, self.mesher_params,
            image_shape=(H // s, W // s) if s > 1 else (H, W),
        )
        self._prev_grays = None  # set on first fleet step

        # Latest frame per camera: dict cam -> (timestamp, left, right, fresh)
        self._frames: Dict[int, list] = {}
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._first_fresh_wall = time.monotonic()
        self._running = True
        self.fleet_steps = 0
        self.frames_in = 0
        self.stale_fills = 0
        self.rejected_frames = 0

        for i in range(n_cameras):
            bus.subscribe(channel_input.format(i=i), self._make_handler(i))
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- ingest ------------------------------------------------------------

    def _make_handler(self, cam: int):
        def handler(_ch, m: StereoImageMessage):
            left = _wire_frame(m.left)
            right = _wire_frame(m.right)
            # Validate at ingest: a frame at the wrong resolution must not
            # reach the batch stack (np.stack over mismatched shapes would
            # throw on the fleet thread and a wrong-sized frame would
            # retrace/mis-project anyway).
            if left.shape[:2] != self._image_shape or right.shape[:2] != self._image_shape:
                self.rejected_frames += 1
                return
            with self._wake:
                if not any(f[3] for f in self._frames.values()):
                    # First fresh frame of this fleet batch: start the
                    # sync-wait clock for stragglers.
                    self._first_fresh_wall = time.monotonic()
                self._frames[cam] = [m.timestamp, left, right, True]
                self.frames_in += 1
                self._wake.notify()

        return handler

    # -- fleet stepping ------------------------------------------------------

    def _ready(self) -> bool:
        n_fresh = sum(1 for f in self._frames.values() if f[3])
        if n_fresh == 0:
            return False
        if n_fresh == self.n_cameras:
            return True
        # Partial fleet: fire once the first waiting frame has aged out.
        return (time.monotonic() - self._first_fresh_wall) > self.max_sync_wait_sec

    def _loop(self) -> None:
        while True:
            with self._wake:
                while self._running and not self._ready():
                    self._wake.wait(0.05)
                if not self._running:
                    return
                batch = self._collect_locked()
            try:
                self._step(*batch)
            except Exception as e:  # a poisoned frame must not kill the fleet
                print(f"farm_perception: step failed: {e!r}", flush=True)

    def _collect_locked(self):
        H, W = self._image_shape
        stamps, fresh_mask, pairs = [], [], []
        for i in range(self.n_cameras):
            f = self._frames.get(i)
            if f is None:
                stamps.append(0)
                fresh_mask.append(False)
                pairs.append(None)
                self.stale_fills += 1
            else:
                stamps.append(f[0])
                pairs.append((f[1], f[2]))
                fresh_mask.append(f[3])
                if not f[3]:
                    self.stale_fills += 1
                f[3] = False  # consumed
        # Uniform batch: keep the compact wire representation (u8/mono) when
        # every present frame agrees — the jitted step casts on device; mixed
        # fleets fall back to f32 RGB on the host.
        present = [a for p in pairs if p is not None for a in p]
        uniform = present and all(
            a.dtype == present[0].dtype and a.shape == present[0].shape
            for a in present
        )
        if uniform:
            zero = np.zeros_like(present[0])
            lefts = [p[0] if p is not None else zero for p in pairs]
            rights = [p[1] if p is not None else zero for p in pairs]
        else:
            zero = np.zeros((H, W, 3), np.float32)
            lefts = [_as_rgb_f32(p[0]) if p is not None else zero for p in pairs]
            rights = [_as_rgb_f32(p[1]) if p is not None else zero for p in pairs]
        return np.stack(lefts), np.stack(rights), stamps, fresh_mask

    def _step(self, lefts, rights, stamps, fresh_mask) -> None:
        import jax
        import jax.numpy as jnp

        from ...mesher.object_mesher import build_meshes
        from ...ops.image import pyr_down, to_grayscale
        from ...parallel.sharded_pipeline import multi_camera_frontend_step

        bl = jnp.asarray(lefts)
        br = jnp.asarray(rights)
        if self._prev_grays is None:
            pg = bl
            if pg.dtype == jnp.uint8:
                pg = pg.astype(jnp.float32) / 255.0
            if pg.ndim == 4:  # (B, H, W, 3) -> gray; (B, H, W) mono is gray
                pg = jax.vmap(to_grayscale)(pg)
            for _ in range(self.mesher_scale.bit_length() - 1):
                pg = jax.vmap(pyr_down)(pg)
            self._prev_grays = pg
        out, cur_grays = multi_camera_frontend_step(
            self._states, self._graphs, self._prev_grays, bl, br,
            self.rig, self.config, self.mesher_params, self.mesh,
            mesher_scale=self.mesher_scale,
        )
        self._states = out.tracker_state
        self._graphs = out.graph
        self._prev_grays = cur_grays
        self.fleet_steps += 1

        mesher_np = jax.tree_util.tree_map(np.asarray, out.mesher)
        enhanced_np = (
            np.asarray(out.perception.enhanced_left)
            if self.channel_output_enhanced
            else None
        )
        for i in range(self.n_cameras):
            if not fresh_mask[i]:
                continue  # stale fill: outputs already published last time
            cam_out = jax.tree_util.tree_map(lambda a: a[i], mesher_np)
            mesh = build_meshes(
                cam_out, self._mesher_rig, self.disparity_scale, self.vertex_min_obs
            )
            if mesh.num_triangles > 0:
                self.bus.publish(
                    self.channel_output_mesh.format(i=i),
                    MeshMessage(
                        timestamp=stamps[i],
                        vertices=mesh.vertices,
                        triangles=mesh.triangles,
                    ),
                )
            if enhanced_np is not None:
                self.bus.publish(
                    self.channel_output_enhanced.format(i=i),
                    ImageMessage.from_array_jpg(stamps[i], enhanced_np[i]),
                )

    def close(self) -> None:
        with self._wake:
            self._running = False
            self._wake.notify()
        self._thread.join(timeout=10)


def from_config(bus: PubSub, node_config_path: str, shared_config_path: str) -> "FarmPerceptionNode":
    from ...config.bindings import load_mesher_params, load_rig
    from ...config.yaml_parser import YamlParser
    from ...models.perception import PerceptionConfig

    parser = YamlParser(node_path=node_config_path, shared_path=shared_config_path)
    rig = load_rig(parser)
    cfg = PerceptionConfig(
        max_disp=int(parser.get("max_disp", 128)),
        internal_scale=int(parser.get("internal_scale", 4)),
        engine=str(parser.get("engine", "patchmatch")),
    )
    mp = load_mesher_params(parser)
    return FarmPerceptionNode(
        bus, rig,
        n_cameras=int(parser.get("n_cameras", 4)),
        perception_config=cfg,
        mesher_params=mp.device,
        channel_input=str(parser.get("channel_input_stereo", "sensors/stereo/cam{i}")),
        channel_output_mesh=str(parser.get("channel_output_mesh", "farm/mesh/cam{i}")),
        channel_output_enhanced=parser.get("channel_output_enhanced", None),
        max_sync_wait_sec=float(parser.get("max_sync_wait_sec", 0.5)),
        disparity_scale=float(mp.disparity_scale),
        vertex_min_obs=int(mp.vertex_min_obs),
        mesher_scale=int(parser.get("mesher_scale", 1)),
    )


def main(argv=None) -> int:
    from ...utils.platform import enable_compile_cache, honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None, help="node YAML (FarmPerceptionNode.yaml)")
    ap.add_argument("--shared", default=None, help="shared rig YAML")
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--cameras", type=int, default=4)
    ap.add_argument("--fx", type=float, default=336.0)
    ap.add_argument("--baseline", type=float, default=0.2)
    ap.add_argument("--width", type=int, default=672)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--internal-scale", type=int, default=4,
                    help="farm operating point (4 = measured 114.8 fps/cam x4)")
    ap.add_argument("--engine", default="patchmatch",
                    choices=["patchmatch", "sgm", "wta"],
                    help="dense stereo engine (wta = cheap CPU smoke)")
    ap.add_argument("--no-enhance", action="store_true")
    ap.add_argument("--mesher-scale", type=int, default=2,
                    help="tracking/mesher at 1/s resolution (reference "
                         "mesher_input_height parity; 2 = 360p from 720p)")
    ap.add_argument("--stats-every", type=float, default=0.0,
                    help="print fleet step/frame counters every N seconds")
    ap.add_argument("--enhanced-out", default=None,
                    help="per-camera enhanced jpg channel template, e.g. farm/enhanced/cam{i}")
    ap.add_argument("--lcm", action="store_true")
    args = ap.parse_args(argv)

    bus_cls = UdpMulticastBus
    if args.lcm:
        from ..lcm_wire import LcmUdpBus as bus_cls
    bus = bus_cls(port=args.port) if args.port else bus_cls()
    if args.config and args.shared:
        node = from_config(bus, args.config, args.shared)
    else:
        from ...models.perception import PerceptionConfig

        cam = PinholeCamera.create(
            args.fx, args.fx, args.width / 2, args.height / 2, args.height, args.width
        )
        rig = StereoCamera.create(cam, cam, args.baseline)
        node = FarmPerceptionNode(
            bus, rig, n_cameras=args.cameras,
            perception_config=PerceptionConfig(
                engine=args.engine,
                internal_scale=args.internal_scale,
                run_enhance=not args.no_enhance,
            ),
            channel_output_enhanced=args.enhanced_out,
            mesher_scale=args.mesher_scale,
        )
    print(f"farm_perception_node listening ({node.n_cameras} cameras)...", flush=True)
    try:
        if args.stats_every > 0:
            import time as _time

            last = (0, _time.monotonic())
            while True:
                _time.sleep(args.stats_every)
                now = _time.monotonic()
                steps = node.fleet_steps
                rate = (steps - last[0]) / max(now - last[1], 1e-9)
                last = (steps, now)
                print(
                    f"fleet_steps={steps} ({rate:.2f}/s = "
                    f"{rate * node.n_cameras:.1f} cam-fps) frames_in={node.frames_in}"
                    f" stale={node.stale_fills} rejected={node.rejected_frames}",
                    flush=True,
                )
        else:
            threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        node.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

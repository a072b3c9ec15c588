"""Live operator view node: HTTP dashboard served from bus channels
(reference live Visualizer3D / lcm_image_viewer operational parity)."""

import json
import urllib.request

import numpy as np
import pytest

from ocean_perception_tpu.fabric.messages import (
    ImageMessage,
    PoseStampedMessage,
    StereoImageMessage,
)
from ocean_perception_tpu.fabric.nodes.live_view_node import LiveViewNode
from ocean_perception_tpu.fabric.pubsub import InProcessBus


@pytest.fixture
def node():
    bus = InProcessBus()
    n = LiveViewNode(
        bus, ["camera/stereo"], ["vio/filter_pose"], host="127.0.0.1", port=0
    )
    yield bus, n
    n.close()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _publish_mission(bus, n_poses=30):
    rng = np.random.default_rng(0)
    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    bus.publish(
        "camera/stereo",
        StereoImageMessage(
            left=ImageMessage.from_array(1, img),
            right=ImageMessage.from_array(1, img),
            timestamp=1,
        ),
    )
    for i in range(n_poses):
        th = 0.1 * i
        q = np.array([np.cos(th / 2), 0.0, 0.0, np.sin(th / 2)])
        cov = np.eye(6) * (0.01 + 0.002 * i)
        bus.publish(
            "vio/filter_pose",
            PoseStampedMessage(
                timestamp=i,
                pose=np.concatenate([q, [np.cos(th), np.sin(th), -1.0]]),
                covariance=cov,
            ),
        )


def test_dashboard_endpoints(node):
    bus, n = node
    _publish_mission(bus)

    status, ctype, body = _get(n.port, "/")
    assert status == 200 and "text/html" in ctype
    assert b"stream.mjpg" in body and b"map.png" in body

    status, ctype, body = _get(n.port, "/frame.jpg")
    assert status == 200 and ctype == "image/jpeg"
    assert body[:2] == b"\xff\xd8"  # JPEG SOI
    # Stereo pair rendered side by side: decodes to H x 2W.
    import cv2

    img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    assert img.shape == (48, 128, 3)

    status, ctype, body = _get(n.port, "/map.png")
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    png = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    # The trajectory + ellipses actually drew something over the background.
    assert (png != 24).any()

    status, ctype, body = _get(n.port, "/stats.json")
    assert status == 200
    stats = json.loads(body)
    assert stats["camera/stereo"]["count"] == 1
    assert stats["vio/filter_pose"]["count"] == 30
    assert stats["_trajectory_points"]["vio/filter_pose"] == 30

    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(n.port, "/nope")
    assert ei.value.code == 404


def test_missing_frame_404(node):
    bus, n = node
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(n.port, "/frame.jpg")
    assert ei.value.code == 404


def test_mjpeg_stream_delivers_frames(node):
    bus, n = node
    _publish_mission(bus)
    req = urllib.request.urlopen(
        f"http://127.0.0.1:{n.port}/stream.mjpg", timeout=10
    )
    assert "multipart/x-mixed-replace" in req.headers.get("Content-Type")
    # First part arrives from the already-latest frame.
    line = req.readline()
    assert line.strip() == b"--frame"
    headers = {}
    while True:
        ln = req.readline().strip()
        if not ln:
            break
        k, v = ln.split(b":", 1)
        headers[k.strip().lower()] = v.strip()
    length = int(headers[b"content-length"])
    jpg = req.read(length)
    assert jpg[:2] == b"\xff\xd8"
    # Publish a new frame; a second part must arrive.
    _publish_mission(bus)
    line = req.readline()
    while line.strip() != b"--frame":
        line = req.readline()
    req.close()


def test_live_mesh_rendering():
    """A published MeshMessage must appear in /mesh.png (wireframe +
    landmark dots over the camera frame) and tick the channel stats —
    reference Visualizer3D live-mesh parity (visualizer_3d.hpp:70-160;
    object_mesher_lcm.cpp:92-95)."""
    import cv2

    from ocean_perception_tpu.fabric.messages import MeshMessage

    bus = InProcessBus()
    n = LiveViewNode(
        bus, ["cam"], [], mesh_channels=["object_mesher/mesh"],
        host="127.0.0.1", port=0,
    )
    try:
        # Empty render first (baseline).
        s0, _, png0 = _get(n.port, "/mesh.png")
        assert s0 == 200
        base0 = cv2.imdecode(np.frombuffer(png0, np.uint8), cv2.IMREAD_COLOR)

        img = np.full((120, 160, 3), 0.2, np.float32)
        bus.publish("cam", ImageMessage.from_array(2, img))
        # A square of 4 vertices at z=5 m in front of the camera, 2 tris.
        verts = np.array(
            [[-1, -1, 5], [1, -1, 5], [1, 1, 5], [-1, 1, 5]], np.float32
        )
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        bus.publish("object_mesher/mesh", MeshMessage(2, verts, tris))

        s1, ctype, png1 = _get(n.port, "/mesh.png")
        assert s1 == 200 and ctype == "image/png"
        im = cv2.imdecode(np.frombuffer(png1, np.uint8), cv2.IMREAD_COLOR)
        assert im.shape[:2] == (120, 160)  # overlays the camera frame
        # The wireframe must actually be drawn: the render differs from both
        # the empty render and the plain camera frame.
        assert im.shape != base0.shape or np.abs(
            im.astype(int) - base0.astype(int)
        ).sum() > 0
        plain = (np.full((120, 160, 3), 0.2 * 255, np.float32)).astype(np.uint8)
        assert np.abs(im.astype(int) - plain.astype(int)).sum() > 1000

        stats = json.loads(_get(n.port, "/stats.json")[2])
        assert stats["object_mesher/mesh"]["count"] == 1
        # Dashboard advertises the mesh panel.
        _, _, html = _get(n.port, "/")
        assert b"/mesh.png?channel=object_mesher/mesh" in html
    finally:
        n.close()

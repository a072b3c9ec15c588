"""LCM wire compatibility: type marshalling, fingerprints, UDP framing, bus.

The reference fleet speaks LCM (lcmtypes/*.lcm compiled by lcm-gen,
README.md:63-67); fabric/lcm_types.py + fabric/lcm_wire.py implement the
published LCM encoding/fingerprint/UDP-framing algorithms so our nodes can
interoperate with unmodified LCM peers. These tests pin the byte-level
contract: primitive layouts per the spec, fingerprint regression constants,
LC02/LC03 framing, fragmentation reassembly, and the dataclass bridge.
"""

import struct
import time

import numpy as np
import pytest

from conftest import REFERENCE_DIR, requires_reference
from ocean_perception_tpu.fabric import lcm_gen
from ocean_perception_tpu.fabric import lcm_types as lt
from ocean_perception_tpu.fabric import lcm_wire as lw
from ocean_perception_tpu.fabric import messages as ms


# ---------------------------------------------------------------------------
# Encoding primitives (byte layouts straight from the LCM spec)
# ---------------------------------------------------------------------------

def test_string_encoding_layout():
    # string = i32 length INCLUDING the terminating NUL, bytes, NUL.
    sd = lt.LcmStructDef("t", "s", (lt.Member("name", "string"),))
    body = sd.encode_fields({"name": "abc"})
    assert body == b"\x00\x00\x00\x04abc\x00"
    assert sd.encode_fields({"name": ""}) == b"\x00\x00\x00\x01\x00"


def test_primitives_are_big_endian():
    sd = lt.LcmStructDef(
        "t", "p",
        (lt.Member("a", "int32_t"), lt.Member("b", "int16_t"),
         lt.Member("c", "double"), lt.Member("d", "boolean")),
    )
    body = sd.encode_fields({"a": 1, "b": 2, "c": 1.5, "d": True})
    assert body == struct.pack(">ihdb", 1, 2, 1.5, 1)
    back, off = sd.decode_fields(body, 0)
    assert off == len(body)
    assert back == {"a": 1, "b": 2, "c": 1.5, "d": True}


def test_variable_byte_array_roundtrip():
    v = {"width": 3, "height": 2, "channels": 1, "format": "mono8",
         "encoding": "raw", "size": 6, "data": bytes(range(6))}
    buf = lt.IMAGE_T.encode(v)
    sd, back = lt.decode_by_fingerprint(buf)
    assert sd is lt.IMAGE_T and back == v


def test_fixed_array_layout():
    body = lt.MESH_TRIANGLE_T.encode_fields({"vertex_indices": [7, 8, 9]})
    assert body == struct.pack(">iii", 7, 8, 9)


def test_nested_struct_inline_without_fingerprint():
    # Only the top-level message carries the 8-byte fingerprint.
    v = {"position": {"x": 1.0, "y": 2.0, "z": 3.0},
         "orientation": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0}}
    assert len(lt.POSE3_T.encode_fields(v)) == 7 * 8
    assert len(lt.POSE3_T.encode(v)) == 8 + 7 * 8


# ---------------------------------------------------------------------------
# Fingerprints
# ---------------------------------------------------------------------------

def test_fingerprint_regression_pins():
    """Computed once from the spec implementation; any drift in the hash or
    in a schema declaration (member order/name/type/dims) breaks the wire."""
    pins = {
        lt.HEADER_T: "2bd2ccd48e3a0cd9",
        lt.VECTOR3_T: "ae7e5fba5eeca11e",
        lt.IMU_MEASUREMENT_T: "c20a6c494eb31864",
        lt.STEREO_IMAGE_T: "c67544d464b8ed90",
        lt.MESH_STAMPED_T: "a56c37ab3e43ac2e",
    }
    for sd, want in pins.items():
        assert sd.fingerprint().hex() == want, sd.full_name


def test_fingerprints_unique_and_stable():
    fps = [t.fingerprint() for t in lt.ALL_TYPES]
    assert len(set(fps)) == len(fps)
    assert all(len(f) == 8 for f in fps)
    assert lt.IMU_MEASUREMENT_T.fingerprint() == lt.IMU_MEASUREMENT_T.fingerprint()


def test_fingerprint_sensitivity():
    base = lt.LcmStructDef("p", "a", (lt.Member("x", "double"),))
    renamed = lt.LcmStructDef("p", "a", (lt.Member("y", "double"),))
    retyped = lt.LcmStructDef("p", "a", (lt.Member("x", "float"),))
    arrayed = lt.LcmStructDef("p", "a", (lt.Member("x", "double", (("const", 3),)),))
    fps = {d.fingerprint() for d in (base, renamed, retyped, arrayed)}
    assert len(fps) == 4
    # ...but the struct/package NAME does not participate (LCM property:
    # renaming a type keeps it wire-compatible).
    othername = lt.LcmStructDef("q", "b", (lt.Member("x", "double"),))
    assert othername.fingerprint() == base.fingerprint()


def test_fingerprint_member_order_matters():
    ab = lt.LcmStructDef("p", "t", (lt.Member("a", "int32_t"), lt.Member("b", "double")))
    ba = lt.LcmStructDef("p", "t", (lt.Member("b", "double"), lt.Member("a", "int32_t")))
    assert ab.fingerprint() != ba.fingerprint()


def test_fingerprint_nested_contribution():
    # A nested struct member contributes recursively (rotl1 per level), so
    # changing the CHILD's definition changes the PARENT's fingerprint.
    child1 = lt.LcmStructDef("p", "c", (lt.Member("x", "double"),))
    child2 = lt.LcmStructDef("p", "c", (lt.Member("x", "float"),))
    p1 = lt.LcmStructDef("p", "t", (lt.Member("c", child1),))
    p2 = lt.LcmStructDef("p", "t", (lt.Member("c", child2),))
    assert p1.fingerprint() != p2.fingerprint()


def test_decode_rejects_wrong_fingerprint():
    buf = lt.DEPTH_MEASUREMENT_T.encode({"header": lt.make_header(1), "depth": 2.0})
    with pytest.raises(ValueError):
        lt.IMU_MEASUREMENT_T.decode(buf)
    sd, v = lt.decode_by_fingerprint(b"\0" * 16)
    assert sd is None and v is None


# ---------------------------------------------------------------------------
# IDL parser (lcm-gen front-end parity)
# ---------------------------------------------------------------------------

@requires_reference
def test_parser_matches_hand_declared_schemas():
    """Parse the reference's ACTUAL .lcm files and require byte-identical
    fingerprints with the hand-declared table — two independent routes to
    every schema must agree on the wire contract."""
    import os

    defs = lcm_gen.parse_lcm_dir(os.path.join(REFERENCE_DIR, "lcmtypes"))
    assert len(defs) == 16
    for sd in lt.ALL_TYPES:
        if sd is lt.POSE3_COV_STAMPED_T:
            continue  # our extension: deliberately NOT a reference schema
        parsed = defs[sd.full_name]
        assert parsed.fingerprint() == sd.fingerprint(), sd.full_name
        assert [m.name for m in parsed.members] == [m.name for m in sd.members]


def test_parser_consts_and_comments():
    src = """
    package demo;
    /* block
       comment */
    struct thing_t {
      const int32_t MODE_A = 1, MODE_B = 2;
      const double SCALE = 1.5;
      int64_t utime;    // trailing comment
      double grid[4][4];
      int32_t n;
      byte data[n];
    }
    """
    raw = lcm_gen.parse_lcm_source(src)
    assert raw[0]["consts"] == {"MODE_A": 1, "MODE_B": 2, "SCALE": 1.5}
    defs = lcm_gen.resolve_structs(raw)
    sd = defs["demo.thing_t"]
    grid = [[float(r * 4 + c) for c in range(4)] for r in range(4)]
    v = {"utime": 7, "grid": grid, "n": 3, "data": b"\x01\x02\x03"}
    back = sd.decode(sd.encode(v))
    assert back == v


def test_parser_rejects_unknown_type():
    with pytest.raises(ValueError, match="unknown LCM type"):
        lcm_gen.resolve_structs(
            lcm_gen.parse_lcm_source("package p; struct a_t { missing_t x; }")
        )


# ---------------------------------------------------------------------------
# UDP framing (LC02 / LC03)
# ---------------------------------------------------------------------------

def test_short_datagram_layout():
    [d] = lw.encode_datagrams("CHAN", b"payload", seq=5)
    magic, seq = struct.unpack_from(">II", d)
    assert magic == 0x4C433032 and seq == 5
    assert d[8:] == b"CHAN\0payload"


def test_fragmented_roundtrip():
    payload = bytes(np.random.default_rng(0).integers(0, 256, 200_000, np.uint8))
    dgrams = lw.encode_datagrams("big", payload, seq=9)
    assert len(dgrams) > 1
    assert struct.unpack_from(">I", dgrams[0])[0] == 0x4C433033
    # total reassembled size matches msg_size in every header
    for d in dgrams:
        _, seq, msg_size, *_ = struct.unpack_from(">IIIIHH", d)
        assert (seq, msg_size) == (9, len(payload))
    r = lw.Reassembler()
    out = None
    for d in dgrams:
        out = r.push(("1.2.3.4", 1111), d) or out
    assert out == ("big", payload)


def test_reassembly_is_keyed_per_sender():
    # Two senders using the same msg_seq must not interleave.
    pa = bytes([1]) * 150_000
    pb = bytes([2]) * 150_000
    da = lw.encode_datagrams("c", pa, seq=1)
    db = lw.encode_datagrams("c", pb, seq=1)
    r = lw.Reassembler()
    outs = []
    for x, y in zip(da, db):  # interleaved arrival
        for sender, d in ((("A", 1), x), (("B", 2), y)):
            got = r.push(sender, d)
            if got:
                outs.append(got[1])
    assert sorted(map(bytes, outs)) == sorted([pa, pb])


def test_out_of_order_fragments():
    payload = bytes(range(256)) * 1000
    dgrams = lw.encode_datagrams("c", payload, seq=3)
    r = lw.Reassembler()
    out = None
    for d in reversed(dgrams):
        out = r.push(("A", 1), d) or out
    assert out == ("c", payload)


# ---------------------------------------------------------------------------
# Bridge: our dataclasses <-> vehicle.* lcmtypes
# ---------------------------------------------------------------------------

def _roundtrip(msg):
    sd, values = lw.to_lcm(msg)
    buf = sd.encode(values)
    sd2, v2 = lt.decode_by_fingerprint(buf)
    assert sd2 is sd
    return lw.from_lcm(sd2, v2)


def test_bridge_imu():
    m = ms.ImuMessage(12345, np.array([0.1, -0.2, 0.3]), np.array([9.0, 0.5, -1.0]))
    b = _roundtrip(m)
    assert b.timestamp == m.timestamp
    np.testing.assert_allclose(b.angular_velocity, m.angular_velocity)
    np.testing.assert_allclose(b.linear_acceleration, m.linear_acceleration)


def test_bridge_depth_range_mag():
    d = _roundtrip(ms.DepthMessage(5, 3.25))
    assert (d.timestamp, d.depth) == (5, 3.25)
    r = _roundtrip(ms.RangeMessage(6, 10.5, np.array([1.0, 2.0, 3.0]), beacon_id=2))
    assert (r.timestamp, r.range, r.beacon_id) == (6, 10.5, 2)
    np.testing.assert_allclose(r.point, [1.0, 2.0, 3.0])
    g = _roundtrip(ms.MagMessage(7, np.array([22.0, 0.0, -45.0])))
    np.testing.assert_allclose(g.field, [22.0, 0.0, -45.0])


def test_bridge_pose():
    pose = np.array([0.5, 0.5, 0.5, 0.5, 1.0, -2.0, 3.0])
    p = _roundtrip(ms.PoseStampedMessage(9, "world", pose))
    assert p.frame_id == "world"
    np.testing.assert_allclose(p.pose, pose)


def test_bridge_stereo_image_u8():
    rng = np.random.default_rng(0)
    img = rng.random((8, 10)).astype(np.float32)
    m = ms.StereoImageMessage(
        42, 1, ms.ImageMessage.from_array(42, img), ms.ImageMessage.from_array(42, img)
    )
    b = _roundtrip(m)
    assert (b.timestamp, b.camera_id) == (42, 1)
    # float32 quantizes to u8 on the reference's 8-bit image_t wire.
    np.testing.assert_allclose(b.left.to_array(), img, atol=1.0 / 255.0 + 1e-6)


def test_bridge_color_image_channel_order():
    """3-channel frames ride the wire as bgr8 (the reference's convention);
    our RGB arrays must roundtrip unswapped AND the wire bytes must actually
    be BGR so a reference consumer sees correct colors."""
    rgb = np.zeros((2, 2, 3), np.float32)
    rgb[..., 0] = 1.0  # pure red
    m = ms.StereoImageMessage(
        1, 0, ms.ImageMessage.from_array(1, rgb), ms.ImageMessage.from_array(1, rgb)
    )
    sd, values = lw.to_lcm(m)
    wire = np.frombuffer(bytes(values["img_left"]["data"]), np.uint8).reshape(2, 2, 3)
    assert values["img_left"]["format"] == "bgr8"
    assert (wire[..., 2] == 255).all() and (wire[..., 0] == 0).all()  # red in BGR slot
    back = lw.from_lcm(sd, sd.decode(sd.encode(values)))
    np.testing.assert_allclose(back.left.to_array(), rgb, atol=1 / 255 + 1e-6)


def test_bridge_color_jpg_channel_order():
    """3-channel JPEG content must be true BGR on the wire (a reference
    consumer cv2-decodes it as a BGR Mat) and come back as RGB on ours."""
    import cv2

    rgb = np.zeros((16, 16, 3), np.float32)
    rgb[..., 0] = 1.0  # pure red
    m = ms.StereoImageMessage(
        1, 0,
        ms.ImageMessage.from_array_jpg(1, rgb),
        ms.ImageMessage.from_array_jpg(1, rgb),
    )
    sd, values = lw.to_lcm(m)
    wire = cv2.imdecode(
        np.frombuffer(bytes(values["img_left"]["data"]), np.uint8),
        cv2.IMREAD_UNCHANGED,
    )
    # Decoded as the reference would (BGR Mat): red must sit in channel 2.
    assert wire[..., 2].mean() > 200 and wire[..., 0].mean() < 50
    back = lw.from_lcm(sd, sd.decode(sd.encode(values)))
    np.testing.assert_allclose(back.left.to_array(), rgb, atol=0.1)


def test_bus_tap_sees_all_channels():
    """set_tap observes every decoded message with no subscriptions — the
    supported observability hook channel_spy rides."""
    from ocean_perception_tpu.fabric.pubsub import UdpMulticastBus

    port = LCM_TEST_PORT + 8
    tx = UdpMulticastBus(port=port)
    rx = UdpMulticastBus(port=port)
    seen = []
    try:
        rx.set_tap(lambda ch, m: seen.append((ch, type(m).__name__)))
        time.sleep(0.1)
        tx.publish("a/b", ms.DepthMessage(1, 1.0))
        tx.publish("c/d", ms.MagMessage(2, np.zeros(3)))
        deadline = time.time() + 5
        while time.time() < deadline and len(seen) < 2:
            time.sleep(0.05)
        assert sorted(seen) == [("a/b", "DepthMessage"), ("c/d", "MagMessage")]
    finally:
        tx.close()
        rx.close()


def test_bridge_mesh():
    verts = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0], [6.0, 7.0, 8.0]])
    tris = np.array([[0, 1, 2]], np.int32)
    b = _roundtrip(ms.MeshMessage(3, verts, tris))
    np.testing.assert_allclose(b.vertices, verts)
    np.testing.assert_array_equal(b.triangles, tris)


# ---------------------------------------------------------------------------
# The bus over real sockets
# ---------------------------------------------------------------------------

LCM_TEST_PORT = 7971


def test_lcm_bus_loopback_small_and_fragmented():
    tx = lw.LcmUdpBus(port=LCM_TEST_PORT)
    rx = lw.LcmUdpBus(port=LCM_TEST_PORT)
    got = []
    raw = []
    try:
        rx.subscribe("imu", lambda ch, m: got.append((ch, m)))
        rx.subscribe("cam", lambda ch, m: got.append((ch, m)))
        rx.subscribe_lcm("imu", lambda ch, sd, v: raw.append(sd.full_name))
        time.sleep(0.1)

        tx.publish("imu", ms.ImuMessage(1, np.zeros(3), np.array([0.0, 0.0, -9.81])))
        big = np.zeros((120, 160), np.float32)  # 76 KB raw -> u8 -> still LC02? 19KB u8
        hi = np.tile(np.linspace(0, 1, 160, dtype=np.float32), (300, 1))  # 300x160
        frame = ms.StereoImageMessage(
            2, 0,
            ms.ImageMessage.from_array(2, np.tile(hi, (2, 3))),  # 600x480 -> 288KB u8
            ms.ImageMessage.from_array(2, big),
        )
        tx.publish("cam", frame)

        deadline = time.time() + 5
        while time.time() < deadline and len(got) < 2:
            time.sleep(0.05)
        assert len(got) == 2, got
        chans = {ch for ch, _ in got}
        assert chans == {"imu", "cam"}
        assert raw == ["vehicle.imu_measurement_t"]
        stereo = next(m for ch, m in got if ch == "cam")
        assert (stereo.left.height, stereo.left.width) == (600, 480)
    finally:
        tx.close()
        rx.close()


def test_lcm_bus_mmf_stereo_inbound(tmp_path):
    """A reference-era publisher ships frames as mmf_stereo_image_t: a
    descriptor pointing into a memory-mapped file (image_subscriber.cpp:29-91).
    Our bus must read the blocks and deliver a normal StereoImageMessage."""
    rng = np.random.default_rng(3)
    left = (rng.random((6, 8)) * 255).astype(np.uint8)
    right = (rng.random((6, 8)) * 255).astype(np.uint8)
    mm = tmp_path / "images.mm"
    pad = b"\xAA" * 16
    mm.write_bytes(pad + left.tobytes() + right.tobytes())

    def desc(offset, arr):
        return {
            "width": arr.shape[1], "height": arr.shape[0], "channels": 1,
            "format": "mono8", "encoding": "raw",
            "mm_filename": str(mm), "offset": offset, "size": arr.nbytes,
        }

    v = {
        "header": lt.make_header(77, 3),
        "img_left": desc(16, left),
        "img_right": desc(16 + left.nbytes, right),
    }
    tx = lw.LcmUdpBus(port=LCM_TEST_PORT + 2)
    rx = lw.LcmUdpBus(port=LCM_TEST_PORT + 2)
    got = []
    try:
        rx.subscribe("stereo", lambda ch, m: got.append(m))
        time.sleep(0.1)
        tx.publish_lcm("stereo", lt.MMF_STEREO_IMAGE_T, v)
        deadline = time.time() + 5
        while time.time() < deadline and not got:
            time.sleep(0.05)
        assert got, "mmf stereo frame never arrived"
        m = got[0]
        assert isinstance(m, ms.StereoImageMessage)
        assert (m.timestamp, m.camera_id) == (77, 3)
        np.testing.assert_allclose(m.left.to_array(), left / 255.0)
        np.testing.assert_allclose(m.right.to_array(), right / 255.0)
    finally:
        tx.close()
        rx.close()


def test_lcm_bus_regex_subscription():
    """LCM subscriptions are anchored regexes (lcm_subscribe semantics; how
    lcm-spy watches \".*\")."""
    tx = lw.LcmUdpBus(port=LCM_TEST_PORT + 3)
    rx = lw.LcmUdpBus(port=LCM_TEST_PORT + 3)
    all_msgs, vio_only = [], []
    try:
        rx.subscribe_lcm(".*", lambda ch, sd, v: all_msgs.append(ch))
        rx.subscribe("vio/.*", lambda ch, m: vio_only.append(ch))
        time.sleep(0.1)
        tx.publish("vio/pose/filter", ms.DepthMessage(1, 1.0))
        tx.publish("sensors/depth", ms.DepthMessage(2, 2.0))
        deadline = time.time() + 5
        while time.time() < deadline and len(all_msgs) < 2:
            time.sleep(0.05)
        assert sorted(all_msgs) == ["sensors/depth", "vio/pose/filter"]
        # anchored: "vio/.*" matches the vio channel only, not a substring.
        assert vio_only == ["vio/pose/filter"]
    finally:
        tx.close()
        rx.close()


def test_channel_spy_smoke(capsys):
    """The lcm-spy-parity monitor sees traffic on both transports."""
    import threading as th

    from ocean_perception_tpu.fabric.nodes import channel_spy

    port = LCM_TEST_PORT + 4
    t = th.Thread(
        target=channel_spy.main,
        args=(["--lcm", "--port", str(port), "--interval", "0.5", "--duration", "3"],),
        daemon=True,
    )
    t.start()
    tx = lw.LcmUdpBus(port=port)
    try:
        time.sleep(0.5)
        for i in range(5):
            tx.publish("sensors/imu", ms.ImuMessage(i, np.zeros(3), np.zeros(3)))
            time.sleep(0.1)
        t.join(timeout=10)
        assert not t.is_alive()
        out = capsys.readouterr().out
        assert "sensors/imu" in out and "vehicle.imu_measurement_t" in out
    finally:
        tx.close()


def test_native_lcm_bus_interop():
    """The C++ transport's LCM mode (udp_bus_create_lcm) and the Python
    LcmUdpBus must exchange both LC02 (small) and LC03 (fragmented) traffic
    in both directions — same bytes a liblcm peer would see."""
    from ocean_perception_tpu.fabric.native_bus import NativeLcmBus, native_available

    if not native_available():
        pytest.skip("native fabric library unavailable")

    port = LCM_TEST_PORT + 5
    native = NativeLcmBus(port=port)
    py = lw.LcmUdpBus(port=port)
    native_got, py_got = [], []
    try:
        native.subscribe("small", lambda ch, m: native_got.append(m))
        native.subscribe("big", lambda ch, m: native_got.append(m))
        py.subscribe("small", lambda ch, m: py_got.append(m))
        py.subscribe("big", lambda ch, m: py_got.append(m))
        time.sleep(0.2)

        rng = np.random.default_rng(1)
        frame = rng.random((300, 400)).astype(np.float32)  # 120 KB u8 -> LC03
        stereo = ms.StereoImageMessage(
            9, 0, ms.ImageMessage.from_array(9, frame), ms.ImageMessage.from_array(9, frame)
        )
        # python -> native
        py.publish("small", ms.DepthMessage(1, 1.25))
        py.publish("big", stereo)
        # native -> python
        native.publish("small", ms.DepthMessage(2, 2.5))
        native.publish("big", stereo)

        # Multicast loopback: each bus also hears its own messages (LCM
        # behaves the same); what matters is CROSS-delivery of both framing
        # paths, checked by content.
        def cross_ok():
            return (
                any(isinstance(m, ms.DepthMessage) and m.depth == 1.25 for m in native_got)
                and any(isinstance(m, ms.DepthMessage) and m.depth == 2.5 for m in py_got)
                and sum(isinstance(m, ms.StereoImageMessage) for m in native_got) >= 2
                and sum(isinstance(m, ms.StereoImageMessage) for m in py_got) >= 2
            )

        deadline = time.time() + 10
        while time.time() < deadline and not cross_ok():
            time.sleep(0.05)
        assert cross_ok(), (native_got, py_got)
        for got in (native_got, py_got):
            for big in (m for m in got if isinstance(m, ms.StereoImageMessage)):
                np.testing.assert_allclose(
                    big.left.to_array(), frame, atol=1.0 / 255.0 + 1e-6
                )
    finally:
        native.close()
        py.close()


def test_mmf_publisher_roundtrip(tmp_path):
    """Outbound zero-copy path: frames into a slot file + tiny descriptors on
    the LCM bus; our own subscriber (= the reference's ImageSubscriber role)
    reconstructs the frames. Two frames exercise slot rotation."""
    port = LCM_TEST_PORT + 6
    tx = lw.LcmUdpBus(port=port)
    rx = lw.LcmUdpBus(port=port)
    pub = lw.MmfPublisher(tx, str(tmp_path / "frames.mm"), slot_bytes=1 << 16)
    got = []
    rng = np.random.default_rng(5)
    try:
        rx.subscribe("stereo", lambda ch, m: got.append(m))
        time.sleep(0.1)
        frames = [rng.random((20, 30)).astype(np.float32) for _ in range(2)]
        for i, f in enumerate(frames):
            pub.publish_stereo(
                "stereo",
                ms.StereoImageMessage(
                    i, 0, ms.ImageMessage.from_array(i, f),
                    ms.ImageMessage.from_array(i, f[::-1].copy()),
                ),
            )
        deadline = time.time() + 5
        while time.time() < deadline and len(got) < 2:
            time.sleep(0.05)
        assert len(got) == 2
        for i, f in enumerate(frames):
            m = next(g for g in got if g.timestamp == i)
            np.testing.assert_allclose(m.left.to_array(), f, atol=1 / 255 + 1e-6)
            np.testing.assert_allclose(m.right.to_array(), f[::-1], atol=1 / 255 + 1e-6)
    finally:
        pub.close()
        tx.close()
        rx.close()


@requires_reference
def test_estimator_from_reference_yaml_over_lcm_wire():
    """The full drop-in scenario: our estimator node built from the
    REFERENCE's unmodified StateEstimatorLcm.yaml (its channel names), fed
    over REAL LCM wire exactly as its retired C++ counterpart was — IMU +
    init pose in on sim/auv/*, filter poses out on vio/filter/world_P_body."""
    import os

    from ocean_perception_tpu.fabric.nodes.state_estimator_node import StateEstimatorNode

    port = LCM_TEST_PORT + 7
    node_bus = lw.LcmUdpBus(port=port)
    sensor_bus = lw.LcmUdpBus(port=port)
    poses = []
    try:
        node = StateEstimatorNode.from_config(
            node_bus,
            os.path.join(REFERENCE_DIR, "config/auv/lcm_nodes/StateEstimatorLcm.yaml"),
            os.path.join(REFERENCE_DIR, "config/shared/Farmsim.yaml"),
        )
        sensor_bus.subscribe("vio/filter/world_P_body", lambda ch, m: poses.append(m))
        time.sleep(0.2)

        sensor_bus.publish(
            "sim/auv/pose/world_P_body_initial",
            ms.PoseStampedMessage(timestamp=0, pose=np.array([1.0, 0, 0, 0, 0, 0, 0])),
        )
        deadline = time.time() + 10
        while time.time() < deadline and not node.est.ekf_state:
            time.sleep(0.05)
        assert node.est.ekf_state is not None, "init pose never arrived over LCM"

        g = np.asarray(node.est.params.n_gravity, np.float64)
        for k in range(20):
            sensor_bus.publish(
                "sim/auv/imu",
                ms.ImuMessage(
                    timestamp=int((k + 1) * 1e7),
                    angular_velocity=np.zeros(3),
                    linear_acceleration=-g,  # at rest: specific force cancels gravity
                ),
            )
            time.sleep(0.01)
        deadline = time.time() + 10
        while time.time() < deadline and not poses:
            time.sleep(0.05)
        assert poses, "no filter pose came back on the reference's output channel"
        assert np.linalg.norm(np.asarray(poses[-1].pose[4:7])) < 0.5
    finally:
        node_bus.close()
        sensor_bus.close()


def test_image_viewer_counter_fallback_for_timestampless_frames(tmp_path):
    """LCM image_t has no timestamp; the viewer must not overwrite one PNG."""
    import os

    from ocean_perception_tpu.fabric.nodes.image_viewer import ImageViewerNode
    from ocean_perception_tpu.fabric.pubsub import InProcessBus

    bus = InProcessBus()
    ImageViewerNode(bus, "viz", str(tmp_path))
    img = np.zeros((4, 4), np.float32)
    for _ in range(3):
        m = ms.ImageMessage.from_array(0, img)  # timestamp 0, like image_t
        bus.publish("viz", m)
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 3, files


def test_lcm_bus_ignores_foreign_payloads():
    """A non-LCM datagram or unknown fingerprint must not kill the rx loop."""
    tx = lw.LcmUdpBus(port=LCM_TEST_PORT + 1)
    rx = lw.LcmUdpBus(port=LCM_TEST_PORT + 1)
    got = []
    try:
        rx.subscribe("d", lambda ch, m: got.append(m))
        time.sleep(0.1)
        # Garbage datagram straight to the socket.
        tx._tx.sendto(b"\xde\xad\xbe\xef junk", (tx.group, tx.port))
        # Unknown-fingerprint payload on a watched channel.
        tx.publish_encoded("d", b"\x01\x02\x03\x04\x05\x06\x07\x08rest")
        # Then a valid message still arrives.
        tx.publish("d", ms.DepthMessage(11, 4.5))
        deadline = time.time() + 5
        while time.time() < deadline and not got:
            time.sleep(0.05)
        assert len(got) == 1 and got[0].depth == 4.5
    finally:
        tx.close()
        rx.close()


# ---------------------------------------------------------------------------
# Hardening (round-3 review): covariance on the wire, corrupt-input guards,
# mmf regrow safety, lcm_gen const dims.
# ---------------------------------------------------------------------------

def test_bridge_pose_covariance_survives_wire():
    """A fix's covariance must ride the wire — dropping it would make
    receive_pose substitute its default and fuse fixes over-confident."""
    pose = np.array([1.0, 0, 0, 0, 1.0, -2.0, 3.0])
    cov = np.diag([1e-4, 2e-4, 3e-4, 4e-4, 5e-4, 6e-4])
    sd, v = lw.to_lcm(ms.PoseStampedMessage(9, "world", pose, covariance=cov))
    assert sd is lt.POSE3_COV_STAMPED_T
    p = _roundtrip(ms.PoseStampedMessage(9, "world", pose, covariance=cov))
    np.testing.assert_allclose(p.covariance, cov)
    # Covariance-less poses keep riding the REFERENCE type (init pose
    # interop with reference-era peers).
    sd2, _ = lw.to_lcm(ms.PoseStampedMessage(9, "world", pose))
    assert sd2 is lt.POSE3_STAMPED_T


def test_reassembler_rejects_corrupt_fragments():
    payload = bytes(range(256)) * 1000
    dgrams = lw.encode_datagrams("c", payload, seq=7)
    hdr = lw._FRAG_HDR

    # frag_no >= n_frags: would otherwise "complete" with zero-filled holes.
    _, seq, msg_size, frag_off, frag_no, n_frags = hdr.unpack_from(dgrams[1])
    bad = hdr.pack(lw.MAGIC_FRAG, seq, msg_size, frag_off, n_frags + 3, n_frags)
    bad += dgrams[1][hdr.size:]
    r = lw.Reassembler()
    with pytest.raises(ValueError):
        r.push(("A", 1), bad)

    # frag_off past msg_size: bytearray slice assignment would APPEND.
    bad2 = hdr.pack(lw.MAGIC_FRAG, seq, msg_size, msg_size + 1, frag_no, n_frags)
    bad2 += dgrams[1][hdr.size:]
    r2 = lw.Reassembler()
    with pytest.raises(ValueError):
        r2.push(("A", 1), bad2)

    # A clean stream still reassembles after rejects on the same key.
    r3 = lw.Reassembler()
    with pytest.raises(ValueError):
        r3.push(("A", 1), bad2)
    out = None
    for d in dgrams:
        out = r3.push(("A", 1), d) or out
    assert out == ("c", payload)


def test_reassembler_rejects_truncated_datagram():
    r = lw.Reassembler()
    with pytest.raises((ValueError, struct.error)):
        r.push(("A", 1), b"\x4c")  # shorter than any header


def test_decode_rejects_negative_variable_dim():
    sd = lt.LcmStructDef("t", "x_t", (
        lt.Member("n", "int32_t"),
        lt.Member("data", "byte", (("var", "n"),)),
    ))
    buf = sd.fingerprint() + struct.pack(">i", -5)
    with pytest.raises(ValueError):
        sd.decode(buf)
    # Truncated declared length errors too (was: short bytes, silent).
    buf2 = sd.fingerprint() + struct.pack(">i", 100) + b"short"
    with pytest.raises(ValueError):
        sd.decode(buf2)


def test_mmf_regrow_never_overwrites_unpublished_block(tmp_path):
    """Within one publish, a regrow triggered by the SECOND block must not
    relocate onto the first block's bytes (its descriptor isn't out yet)."""

    class _NullBus:
        def publish_lcm(self, *a, **k):
            pass

    pub = lw.MmfPublisher(_NullBus(), str(tmp_path / "f.mm"), slot_bytes=64, n_slots=4)
    a = bytes([1]) * 60          # fits the original slot, lands at offset 0
    b = bytes([2]) * 200         # forces a regrow
    off_a = pub._write_block(a)
    off_b = pub._write_block(b)
    assert not (off_b < off_a + len(a) and off_a < off_b + len(b)), (off_a, off_b)
    pub._f.flush()
    with open(tmp_path / "f.mm", "rb") as f:
        raw = f.read()
    assert raw[off_a:off_a + len(a)] == a
    assert raw[off_b:off_b + len(b)] == b
    pub._unpublished.clear()  # what publish_stereo does after the descriptor
    pub.close()


def test_lcm_gen_const_dims_hex_and_comma_declarations():
    src = """
    package p;
    struct y_t {
        const int32_t N = 8, FLAGS = 0x10;
        double v[N];
        double x, y, z;
        int32_t m;
        byte data[m];
    }
    """
    defs = lcm_gen.resolve_structs(lcm_gen.parse_lcm_source(src))
    sd = defs["p.y_t"]
    names = [m.name for m in sd.members]
    assert names == ["v", "x", "y", "z", "m", "data"]
    # Const-name dim resolved to a CONST dim with the constant's VALUE
    # (lcm-gen hashes the value string; "var" would diverge AND make
    # encode() look up a nonexistent member).
    assert sd.members[0].dims == (("const", 8),)
    assert sd.members[5].dims == (("var", "m"),)
    hand = lt.LcmStructDef("p", "y_t", (
        lt.Member("v", "double", (("const", 8),)),
        lt.Member("x", "double"), lt.Member("y", "double"), lt.Member("z", "double"),
        lt.Member("m", "int32_t"),
        lt.Member("data", "byte", (("var", "m"),)),
    ))
    assert sd.fingerprint() == hand.fingerprint()
    # Encode works end to end (the old parser raised KeyError 'N').
    buf = sd.encode({"v": [0.5] * 8, "x": 1, "y": 2, "z": 3, "m": 2, "data": b"ab"})
    vals = sd.decode(buf)
    assert vals["data"] == b"ab" and vals["v"][0] == 0.5

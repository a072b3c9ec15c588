"""Mesher tests: foreground mask, landmark-graph clustering, object meshing."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.mesher import (
    LandmarkGraph,
    ObjectMesher,
    ObjectMesherParams,
    TriangleMesh,
    estimate_foreground_mask,
    get_cluster_labels,
    update_graph,
)
from ocean_perception_tpu.mesher.landmark_graph import cluster_sizes
from ocean_perception_tpu.mesher.object_mesher import ObjectMesherDeviceParams
from ocean_perception_tpu.tracking import DetectorParams, LKParams, StripeMatcherParams
from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerParams

H, W = 120, 160


def test_foreground_mask_finds_texture():
    rng = np.random.default_rng(0)
    img = np.full((H, W), 0.5, np.float32)
    img += rng.normal(0, 0.003, (H, W)).astype(np.float32)  # faint noise
    # Textured object region.
    img[30:80, 50:110] = rng.random((50, 60)).astype(np.float32)
    mask = np.asarray(estimate_foreground_mask(jnp.asarray(img), ksize=15, min_gradient=20.0))
    assert mask[40:70, 60:100].mean() > 0.8
    assert mask[:20, :30].mean() < 0.1


class TestLandmarkGraph:
    def test_evidence_and_clustering(self):
        K = 8
        g = LandmarkGraph.create(K)
        ids = jnp.arange(K, dtype=jnp.int32)
        alive = jnp.ones(K, bool)
        # Two groups: {0,1,2} and {4,5}, observed consistently.
        observed = np.zeros((K, K), bool)
        for a, b in [(0, 1), (1, 2), (4, 5)]:
            observed[a, b] = observed[b, a] = True
        pair_valid = jnp.asarray(observed | np.eye(K, dtype=bool) == False) & True
        pair_valid = jnp.asarray(np.ones((K, K), bool))
        for _ in range(7):  # reach min_obs_connect_edge = 7
            g = update_graph(g, ids, jnp.asarray(observed), pair_valid, max_weight=11.0)
        labels = np.asarray(get_cluster_labels(g, alive, 7.0))
        assert labels[0] == labels[1] == labels[2]
        assert labels[4] == labels[5]
        assert labels[0] != labels[4]
        assert labels[3] not in (labels[0], labels[4])
        sizes = np.asarray(cluster_sizes(jnp.asarray(labels)))
        assert sizes[labels[0]] == 3
        assert sizes[labels[4]] == 2

    def test_evidence_decays_and_disconnects(self):
        K = 4
        g = LandmarkGraph.create(K)
        ids = jnp.arange(K, dtype=jnp.int32)
        pair_valid = jnp.asarray(np.ones((K, K), bool))
        obs = np.zeros((K, K), bool)
        obs[0, 1] = obs[1, 0] = True
        for _ in range(11):
            g = update_graph(g, ids, jnp.asarray(obs), pair_valid, max_weight=11.0)
        assert float(g.weights[0, 1]) == 11.0  # saturated
        # Stop observing: weight decays below the connect threshold.
        none = jnp.asarray(np.zeros((K, K), bool))
        for _ in range(5):
            g = update_graph(g, ids, none, pair_valid, max_weight=11.0)
        assert float(g.weights[0, 1]) == 6.0
        labels = np.asarray(get_cluster_labels(g, jnp.ones(K, bool), 7.0))
        assert labels[0] != labels[1]

    def test_chain_component(self):
        """A long chain must collapse to one label (pointer jumping)."""
        K = 32
        g = LandmarkGraph.create(K)
        w = np.zeros((K, K), np.float32)
        for i in range(K - 1):
            w[i, i + 1] = w[i + 1, i] = 10.0
        g = g.replace(weights=jnp.asarray(w), ids=jnp.arange(K, dtype=jnp.int32))
        labels = np.asarray(get_cluster_labels(g, jnp.ones(K, bool), 7.0))
        assert (labels == 0).all()

    def test_id_change_resets_edges(self):
        K = 4
        g = LandmarkGraph.create(K)
        ids = jnp.arange(K, dtype=jnp.int32)
        pair_valid = jnp.asarray(np.ones((K, K), bool))
        obs = np.zeros((K, K), bool)
        obs[0, 1] = obs[1, 0] = True
        for _ in range(8):
            g = update_graph(g, ids, jnp.asarray(obs), pair_valid, 11.0)
        # Slot 1 is recycled for a new landmark.
        new_ids = jnp.asarray([0, 99, 2, 3], jnp.int32)
        g = update_graph(g, new_ids, jnp.asarray(np.zeros((K, K), bool)), pair_valid, 11.0)
        assert float(g.weights[0, 1]) == 0.0


@pytest.mark.slow
def test_object_mesher_end_to_end():
    """Textured box over flat background: the mesher should produce a mesh
    concentrated on the box after enough frames to accumulate edge evidence."""
    rng = np.random.default_rng(3)
    d_obj = 12.0
    bg = np.full((H, W + 20), 0.45, np.float32)
    bg += rng.normal(0, 0.004, bg.shape).astype(np.float32)
    obj_tex = (rng.random((60, 70)) * 0.8 + 0.1).astype(np.float32)
    obj_tex = cv2.GaussianBlur(obj_tex, (3, 3), 0.7)

    def frame():
        left = bg[:, :W].copy()
        left[30:90, 60:130] = obj_tex
        right = bg[:, :W].copy()
        x0r = 60 - int(d_obj)
        right[30:90, x0r : x0r + 70] = obj_tex
        return left, right

    cam = PinholeCamera.create(200.0, 200.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.3)
    params = ObjectMesherParams(
        device=ObjectMesherDeviceParams(
            tracker=StereoTrackerParams(
                capacity=64,
                detector=DetectorParams(max_features=64, min_distance=8, border=6),
                lk=LKParams(max_level=2),
                matcher=StripeMatcherParams(max_disp=24, templ_cols=11, templ_rows=11, max_matching_cost=0.4),
                trigger_keyframe_k=2,
            ),
            min_obs_connect_edge=3.0,
            min_obs_disconnect_edge=2.0,
            neighbor_radius_px=60.0,
        ),
        vertex_min_obs=3,
    )
    mesher = ObjectMesher(params, rig)
    mesh = TriangleMesh.empty()
    left, right = frame()
    for _ in range(6):
        mesh = mesher.process_stereo(left, right)
    assert mesh.num_triangles > 0
    # All vertices back-project to the object depth fx*b/d = 200*0.3/12 = 5 m.
    z = mesh.vertices[:, 2]
    assert np.abs(np.median(z) - 5.0) < 0.6


def test_edge_gate_onehot_matches_gather():
    """The one-hot edge foreground gate (round 5: replaces the K^2*S TPU
    gather) is BIT-IDENTICAL to the gather path on every mesher output —
    weights, labels, sizes — including border points, far pairs (whose
    clamped samples differ but are pair_valid-masked), and dead slots."""
    import jax

    from ocean_perception_tpu.mesher.landmark_graph import LandmarkGraph
    from ocean_perception_tpu.mesher.object_mesher import mesher_device_step
    from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerState

    rng = np.random.default_rng(11)
    left = jnp.asarray(rng.random((H, W)).astype(np.float32))
    right = jnp.asarray(np.roll(np.asarray(left), -4, axis=1))
    prev = jnp.asarray(rng.random((H, W)).astype(np.float32))

    K = 48
    tracker = StereoTrackerParams(
        capacity=K,
        detector=DetectorParams(max_features=K, min_distance=6, border=4),
        lk=LKParams(max_level=1),
        matcher=StripeMatcherParams(max_disp=16, templ_cols=9, templ_rows=7),
    )

    outs = {}
    for impl in ("gather", "onehot"):
        params = ObjectMesherDeviceParams(
            tracker=tracker, neighbor_radius_px=40.0, edge_gate_impl=impl
        )
        state = StereoTrackerState.create(tracker)
        # Seed live landmarks spread over the image, incl. borders/corners.
        pts = np.stack(
            [rng.uniform(0, W - 1, K), rng.uniform(0, H - 1, K)], axis=1
        ).astype(np.float32)
        pts[0] = [0.0, 0.0]
        pts[1] = [W - 1.0, H - 1.0]
        table = state.table.replace(
            ids=jnp.arange(K, dtype=jnp.int32),
            pixels=jnp.asarray(pts),
        )
        state = state.replace(table=table)
        graph = LandmarkGraph.create(K)
        step = jax.jit(
            lambda s, g: mesher_device_step(
                s, g, prev, left, right, jnp.float32(100.0), params
            )
        )
        _, g2, out = step(state, graph)
        outs[impl] = (g2, out)

    ga, oa = outs["gather"]
    gb, ob = outs["onehot"]
    np.testing.assert_array_equal(np.asarray(ga.weights), np.asarray(gb.weights))
    np.testing.assert_array_equal(np.asarray(oa.labels), np.asarray(ob.labels))
    np.testing.assert_array_equal(np.asarray(oa.sizes), np.asarray(ob.sizes))

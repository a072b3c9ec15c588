"""Evidence-weighted landmark graph with connected-component clustering.

Reference parity: mesher/landmark_graph.{hpp,cpp} — edges accumulate +1
evidence when observed, -1 when not, clamped to [0, connect+disconnect];
an edge joins the active subgraph once its weight reaches
min_obs_connect_edge, and clusters are connected components of that
subgraph (boost::connected_components).

TPU design: the graph is a dense (K, K) float evidence matrix keyed by slot
(slots map 1:1 to the tracker's fixed landmark slots, so landmark identity is
maintained by the tracker's id array). Connected components run as iterative
min-label propagation: label_i ← min(label_i, min_{j: adj_ij} label_j),
which converges in <= diameter steps — a handful of (K, K) ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LandmarkGraph:
    weights: jnp.ndarray   # (K, K) symmetric evidence
    ids: jnp.ndarray       # (K,) landmark id owning each slot (-1 free)

    @classmethod
    def create(cls, capacity: int) -> "LandmarkGraph":
        return cls(
            weights=jnp.zeros((capacity, capacity), jnp.float32),
            ids=jnp.full((capacity,), -1, jnp.int32),
        )


def update_graph(
    graph: LandmarkGraph,
    slot_ids: jnp.ndarray,      # (K,) current landmark id per tracker slot
    observed: jnp.ndarray,      # (K, K) bool — pair evidence observed this frame
    pair_valid: jnp.ndarray,    # (K, K) bool — both slots alive & in NN range
    max_weight: float,
) -> LandmarkGraph:
    """Evidence update (UpdateEdge ±1 clamped). Slots whose landmark id
    changed since the last frame are reset (their old edges are meaningless)."""
    changed = graph.ids != slot_ids
    reset = changed[:, None] | changed[None, :]
    w = jnp.where(reset, 0.0, graph.weights)
    delta = jnp.where(observed, 1.0, -1.0) * pair_valid.astype(w.dtype)
    w = jnp.clip(w + delta, 0.0, max_weight)
    w = jnp.where(jnp.eye(w.shape[0], dtype=bool), 0.0, w)
    return LandmarkGraph(weights=w, ids=slot_ids)


def get_cluster_labels(
    graph: LandmarkGraph,
    alive: jnp.ndarray,          # (K,) slot validity
    min_subgraph_weight: float,
    iters: int | None = None,
) -> jnp.ndarray:
    """(K,) component label per slot (= min slot index in its component);
    dead slots get label -1."""
    K = graph.weights.shape[0]
    adj = (graph.weights >= min_subgraph_weight) & alive[:, None] & alive[None, :]
    adj = adj | jnp.eye(K, dtype=bool)
    labels0 = jnp.where(alive, jnp.arange(K, dtype=jnp.int32), K)

    import math

    # Neighbor-min + pointer jumping converges in O(log K) steps even for
    # chain-shaped components.
    n_iters = iters if iters is not None else max(4, int(math.ceil(math.log2(max(K, 2)))) + 2)

    def body(_, labels):
        # label_i <- min over neighbors j of label_j, then jump to the root's
        # label (labels[labels]) to short-circuit chains.
        neigh = jnp.where(adj, labels[None, :], K)
        labels = jnp.minimum(labels, jnp.min(neigh, axis=1)).astype(jnp.int32)
        safe = jnp.clip(labels, 0, K - 1)
        jumped = jnp.where(labels < K, labels[safe], labels)
        return jnp.minimum(labels, jumped).astype(jnp.int32)

    labels = jax.lax.fori_loop(0, n_iters, body, labels0)
    return jnp.where(alive, labels, -1)


class ClusterSummary(NamedTuple):
    labels: jnp.ndarray       # (K,)
    sizes: jnp.ndarray        # (K,) size of the component rooted at each slot


def cluster_sizes(labels: jnp.ndarray) -> jnp.ndarray:
    """(K,) number of members of the component whose root is slot k."""
    K = labels.shape[0]
    onehot = (labels[None, :] == jnp.arange(K, dtype=labels.dtype)[:, None]).astype(jnp.int32)
    return jnp.sum(onehot, axis=1)

"""Obstacle meshing (reference: src/vehicle/mesher).

Per frame: tracked landmarks → foreground-texture mask (morph gradient) →
evidence-weighted landmark graph (edges gated by depth similarity and
foreground coverage) → connected-component clusters → per-cluster Delaunay
triangulation → back-projected 3D obstacle meshes.

TPU design: the graph lives as a fixed KxK evidence matrix on device (the
reference uses a Boost adjacency list + GridLookup NN queries — at K~200
landmarks a dense pairwise formulation is faster than any spatial index on
TPU); connected components run as iterative min-label propagation (a few
matrix-vector-ish steps). Delaunay stays host-side (scipy.spatial), fed with
the tiny cluster vertex sets.
"""

from .foreground import estimate_foreground_mask  # noqa: F401
from .landmark_graph import LandmarkGraph, update_graph, get_cluster_labels  # noqa: F401
from .triangle_mesh import TriangleMesh  # noqa: F401
from .object_mesher import ObjectMesher, ObjectMesherParams  # noqa: F401

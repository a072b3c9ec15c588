"""YAML config parsing with the reference's two-file `/shared/` routing.

Reference parity: src/vehicle/params/yaml_parser.hpp:21-80. The reference uses
OpenCV FileStorage YAML (leading ``%YAML:1.0`` directive, ``{rows, cols, data}``
matrix nodes). This parser reads the same files with pyyaml by stripping the
directive, and converts matrix nodes to numpy arrays.

Key semantics preserved:
- A parser owns a *node* YAML tree plus an optional *shared* YAML tree.
- Lookup ids are ``a/b/c`` paths resolved recursively; ids starting with
  ``/shared/`` route to the shared tree (rig calibration), everything else to
  the node tree.
- ``subtree(id)`` returns a sub-parser that keeps the shared-tree routing.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import numpy as np
import yaml

_DIRECTIVE_RE = re.compile(r"^%YAML[:\s].*$", re.MULTILINE)


def load_opencv_yaml(path: str) -> dict:
    """Read an OpenCV-style YAML file into plain Python containers."""
    with open(path, "r") as f:
        text = f.read()
    text = _DIRECTIVE_RE.sub("", text)
    # OpenCV writes `!!opencv-matrix` tags; strip tags pyyaml doesn't know.
    text = text.replace("!!opencv-matrix", "")
    data = yaml.safe_load(text)
    return data if data is not None else {}


def _convert(node: Any) -> Any:
    """Convert {rows, cols, data} matrix nodes into numpy arrays."""
    if isinstance(node, dict) and {"rows", "cols", "data"} <= set(node.keys()):
        arr = np.asarray(node["data"], dtype=np.float64)
        return arr.reshape(int(node["rows"]), int(node["cols"]))
    return node


class YamlParser:
    """Two-tree YAML lookup with `/shared/` routing (yaml_parser.hpp:36-180)."""

    SHARED_PREFIX = "/shared/"

    def __init__(
        self,
        node_path: Optional[str] = None,
        shared_path: Optional[str] = None,
        node_tree: Optional[dict] = None,
        shared_tree: Optional[dict] = None,
    ):
        if node_path is not None:
            node_tree = load_opencv_yaml(node_path)
        if shared_path is not None:
            shared_tree = load_opencv_yaml(shared_path)
        self._node = node_tree if node_tree is not None else {}
        self._shared = shared_tree if shared_tree is not None else {}

    # -- lookup ---------------------------------------------------------------

    def _resolve(self, tree: Any, path: str) -> Any:
        cur = tree
        for part in path.strip("/").split("/"):
            if not isinstance(cur, dict) or part not in cur:
                raise KeyError(path)
            cur = cur[part]
        return _convert(cur)

    def has(self, id_: str) -> bool:
        try:
            self.get(id_)
            return True
        except KeyError:
            return False

    def get(self, id_: str, default: Any = ...) -> Any:
        """Fetch a value; ids starting with /shared/ hit the shared tree."""
        try:
            if id_.startswith(self.SHARED_PREFIX):
                return self._resolve(self._shared, id_[len(self.SHARED_PREFIX):])
            return self._resolve(self._node, id_)
        except KeyError:
            if default is not ...:
                return default
            raise KeyError(id_) from None

    def subtree(self, id_: str) -> "YamlParser":
        """Sub-parser rooted at id_ in the node tree; shared tree carries over."""
        sub = self._resolve(self._node, id_)
        if not isinstance(sub, dict):
            raise KeyError(f"{id_} is not a mapping")
        return YamlParser(node_tree=sub, shared_tree=self._shared)

    # -- typed helpers (YamlToVector / YamlToMatrix / YamlToStereoRig) --------

    def get_vector(self, id_: str, size: Optional[int] = None) -> np.ndarray:
        v = np.asarray(self.get(id_), dtype=np.float64).reshape(-1)
        if size is not None and v.size != size:
            raise ValueError(f"{id_}: expected {size} elements, got {v.size}")
        return v

    def get_matrix(self, id_: str, rows: int, cols: int) -> np.ndarray:
        m = np.asarray(self.get(id_), dtype=np.float64)
        return m.reshape(rows, cols)

    def get_transform(self, id_: str) -> np.ndarray:
        return self.get_matrix(id_, 4, 4)

    def get_enum(self, id_: str, mapping: dict, default: Any = ...) -> Any:
        key = self.get(id_, default=None)
        if key is None:
            if default is not ...:
                return default
            raise KeyError(id_)
        return mapping[str(key)]

    def get_camera(self, id_: str):
        """Load a PinholeCamera from a camera node (YamlToCameraModel parity).

        Expects keys: image_height, image_width, intrinsics [fx, fy, cx, cy].
        """
        from ..core.cameras import PinholeCamera

        sub = f"{id_}/" if id_ else ""
        h = int(self.get(f"{sub}image_height"))
        w = int(self.get(f"{sub}image_width"))
        fx, fy, cx, cy = self.get_vector(f"{sub}intrinsics", 4)
        return PinholeCamera.create(fx, fy, cx, cy, h, w)

    def get_stereo_rig(self, id_: str = "/shared/stereo_forward"):
        """Load a StereoCamera from a stereo rig node (YamlToStereoRig parity).

        Baseline = |t_left - t_right| from the two body_T_cam extrinsics.
        """
        from ..core.cameras import StereoCamera

        cam_l = self.get_camera(f"{id_}/camera_left")
        cam_r = self.get_camera(f"{id_}/camera_right")
        T_l = self.get_transform(f"{id_}/camera_left/body_T_cam")
        T_r = self.get_transform(f"{id_}/camera_right/body_T_cam")
        baseline = float(np.linalg.norm(T_l[:3, 3] - T_r[:3, 3]))
        return StereoCamera.create(cam_l, cam_r, baseline), T_l, T_r

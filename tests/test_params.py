import os
import textwrap

import numpy as np
import pytest

from ocean_perception_tpu.config import YamlParser
from ocean_perception_tpu.config.params import (
    ParamsBase,
    field_vector,
    params,
    subparams,
)

NODE_YAML = """\
%YAML:1.0

a: 456
b: 7.5
flag: 1
name: hello
v: [1, 2, 3]

Inner:
  key1: 3.14159
  Deeper:
    c: 42
"""

SHARED_YAML = """\
%YAML:1.0
n_gravity: [0, 9.81, 0]
stereo_forward:
  camera_left:
    image_height: 376
    image_width: 672
    intrinsics: [336.0, 336.0, 335.5, 187.5]
    body_T_cam:
      rows: 4
      cols: 4
      data: [1, 0, 0, -0.1,  0, 1, 0, 0,  0, 0, 1, 0.1,  0, 0, 0, 1]
  camera_right:
    image_height: 376
    image_width: 672
    intrinsics: [336.0, 336.0, 335.5, 187.5]
    body_T_cam:
      rows: 4
      cols: 4
      data: [1, 0, 0, 0.1,  0, 1, 0, 0,  0, 0, 1, 0.1,  0, 0, 0, 1]
"""


@pytest.fixture()
def parser(tmp_path):
    node = tmp_path / "node.yaml"
    shared = tmp_path / "shared.yaml"
    node.write_text(NODE_YAML)
    shared.write_text(SHARED_YAML)
    return YamlParser(node_path=str(node), shared_path=str(shared))


def test_scalar_and_vector_lookup(parser):
    assert parser.get("a") == 456
    assert parser.get("b") == 7.5
    assert parser.get("Inner/key1") == pytest.approx(3.14159)
    assert parser.get("Inner/Deeper/c") == 42
    np.testing.assert_allclose(parser.get_vector("v", 3), [1, 2, 3])
    with pytest.raises(KeyError):
        parser.get("missing")
    assert parser.get("missing", default=9) == 9


def test_shared_routing(parser):
    """Parity: yaml_parser.hpp /shared/ prefix routes to calibration file."""
    np.testing.assert_allclose(parser.get_vector("/shared/n_gravity", 3), [0, 9.81, 0])
    T = parser.get_transform("/shared/stereo_forward/camera_left/body_T_cam")
    assert T.shape == (4, 4)
    np.testing.assert_allclose(T[0, 3], -0.1)


def test_subtree_keeps_shared(parser):
    sub = parser.subtree("Inner")
    assert sub.get("key1") == pytest.approx(3.14159)
    np.testing.assert_allclose(sub.get_vector("/shared/n_gravity", 3), [0, 9.81, 0])


def test_stereo_rig_loading(parser):
    rig, T_l, T_r = parser.get_stereo_rig()
    assert rig.left.width == 672
    np.testing.assert_allclose(float(rig.baseline), 0.2, rtol=1e-6)


@params
class DeepParams(ParamsBase):
    c: int = 0


@params
class InnerParams(ParamsBase):
    key1: float = 0.0
    deeper: DeepParams = subparams(DeepParams, "Deeper")


@params
class TopParams(ParamsBase):
    a: int = 1
    b: float = 0.0
    flag: bool = False
    name: str = ""
    missing_keeps_default: float = 2.5
    v: np.ndarray = field_vector(3, [0, 0, 0])
    n_gravity: np.ndarray = field_vector(3, [0, 0, 9.81], yaml_id="/shared/n_gravity")
    inner: InnerParams = subparams(InnerParams, "Inner")


def test_params_dataclass_loading(parser):
    p = TopParams.load(parser)
    assert p.a == 456
    assert p.b == 7.5
    assert p.flag is True
    assert p.name == "hello"
    assert p.missing_keeps_default == 2.5
    np.testing.assert_allclose(p.v, [1, 2, 3])
    np.testing.assert_allclose(p.n_gravity, [0, 9.81, 0])
    assert p.inner.key1 == pytest.approx(3.14159)
    assert p.inner.deeper.c == 42


def test_params_defaults_without_yaml():
    p = TopParams.load(YamlParser(node_tree={}))
    assert p.a == 1 and p.inner.deeper.c == 0


def test_reads_reference_style_file(tmp_path):
    """The parser accepts real OpenCV-emitted YAML with %YAML directive."""
    f = tmp_path / "cv.yaml"
    f.write_text("%YAML:1.0\n---\nx: 5\nm: !!opencv-matrix\n  rows: 2\n  cols: 2\n  data: [1,2,3,4]\n")
    p = YamlParser(node_path=str(f))
    assert p.get("x") == 5
    np.testing.assert_allclose(p.get_matrix("m", 2, 2), [[1, 2], [3, 4]])

"""Typed configuration system (reference: src/vehicle/params)."""

from .yaml_parser import YamlParser, load_opencv_yaml  # noqa: F401
from .params import ParamsBase, params  # noqa: F401

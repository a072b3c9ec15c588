"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("cam",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a Mesh over the first n devices.

    Default: 1-D 'cam' axis over all devices — the multi-camera data-parallel
    layout. Pass shape/axis_names for richer layouts (e.g. ('cam', 'strip')).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def camera_sharding(mesh: Mesh, axis: str = "cam") -> NamedSharding:
    """Shard the leading (camera/batch) axis of an array over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.ops.pallas.cost_volume import (
    pallas_cost_volume,
    pallas_supported,
)
from ocean_perception_tpu.stereo.cost import cost_volume


def test_pallas_cost_volume_matches_jnp(rng):
    H, W, D = 32, 64, 16
    left = jnp.asarray(rng.random((H, W)).astype(np.float32))
    right = jnp.asarray(rng.random((H, W)).astype(np.float32))
    ours = np.asarray(pallas_cost_volume(left, right, D, alpha=0.9, interpret=True))
    ref = np.asarray(cost_volume(left, right, D, alpha=0.9))
    # Interior parity is exact; borders (x < D, the last column, and the two
    # outermost rows each side) differ only in edge-clamp flavor for the
    # Sobel term (reflect101 in the jnp path vs edge padding here) — regions
    # the reference's propagation loops skip (bounds [pr, dim-pr-1)).
    np.testing.assert_allclose(ours[2:-2, D + 1 : -2, :], ref[2:-2, D + 1 : -2, :], atol=1e-5)


def test_pallas_supported_budget():
    assert pallas_supported(360, 640, 64)
    assert not pallas_supported(2160, 3840, 256)

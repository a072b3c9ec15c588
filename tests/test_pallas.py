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
    # Interior parity is exact; border columns x < d differ only in clamp
    # flavor (edge-pad vs edge-column select) — compare where x >= D.
    np.testing.assert_allclose(ours[:, D:, :], ref[:, D:, :], atol=1e-5)


def test_pallas_supported_budget():
    assert pallas_supported(360, 640, 64)
    assert not pallas_supported(2160, 3840, 256)

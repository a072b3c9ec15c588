"""Spatial (strip) sharding: image rows across a mesh axis.

The image-domain analog of sequence/context parallelism (SURVEY.md §2.4/§5.7):
rows of each frame shard over the 'strip' mesh axis; elementwise stages stay
local, the global reductions inside the enhancement fits (dark-percentile
counts, LM normal equations over sampled pixels) become XLA collectives that
ride ICI automatically once the inputs carry a sharding constraint.
Composes with the 'cam' data-parallel axis: mesh ('cam', 'strip').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..imaging.enhance import EnhanceParams, enhance_underwater


def strip_sharding(mesh: Mesh, axis: str = "strip", batch_axis: str | None = None):
    """Sharding for (H, W[, C]) images (rows over `axis`) or batched
    (N, H, W[, C]) when batch_axis is given."""
    if batch_axis is None:
        return NamedSharding(mesh, P(axis))
    return NamedSharding(mesh, P(batch_axis, axis))


@functools.lru_cache(maxsize=32)
def _sharded_enhance_fn(mesh: Mesh, params: EnhanceParams, axis: str):
    """Cached jitted closure (a fresh closure per call would retrace)."""
    img_s = NamedSharding(mesh, P(axis))

    @jax.jit
    def run(img, rng):
        img = jax.lax.with_sharding_constraint(img, img_s)
        rng = jax.lax.with_sharding_constraint(rng, img_s)
        return enhance_underwater(img, rng, params)

    return run


def sharded_enhance(
    image: jnp.ndarray,
    range_img: jnp.ndarray,
    mesh: Mesh,
    params: EnhanceParams = EnhanceParams(),
    axis: str = "strip",
):
    """Enhancement with rows sharded over `axis`; semantics identical to the
    unsharded call (reductions become psums)."""
    return _sharded_enhance_fn(mesh, params, axis)(image, range_img)

"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.models.perception import PerceptionConfig
from ocean_perception_tpu.parallel import camera_sharding, make_mesh, multi_camera_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
    return make_mesh(8, axis_names=("cam",))


def _inputs(n, H=64, W=96, seed=0):
    rng = np.random.default_rng(seed)
    canvas = rng.random((H, W + 32)).astype(np.float32)
    left = canvas[:, 16 : 16 + W]
    right = np.roll(canvas, 4, axis=1)[:, 16 : 16 + W]
    tint = np.array([0.35, 0.75, 0.9], np.float32)
    lf = np.clip(left[..., None] * tint + 0.05, 0, 1)
    rf = np.clip(right[..., None] * tint + 0.05, 0, 1)
    # Each camera gets a slightly different frame.
    bl = np.stack([np.clip(lf + i * 1e-3, 0, 1) for i in range(n)])
    br = np.stack([rf] * n)
    return jnp.asarray(bl), jnp.asarray(br)


def _rig(H=64, W=96):
    cam = PinholeCamera.create(80.0, 80.0, W / 2, H / 2, H, W)
    return StereoCamera.create(cam, cam, 0.12)


@pytest.mark.slow
def test_multi_camera_step_sharded(mesh):
    n_cams = 16
    bl, br = _inputs(n_cams)
    cfg = PerceptionConfig(engine="wta", max_disp=16, internal_scale=1, run_enhance=False)
    out, stats = multi_camera_step(bl, br, _rig(), cfg, mesh)
    assert out.disparity.shape == (n_cams, 64, 96)
    # Outputs carry the camera sharding.
    shard_axes = out.disparity.sharding.spec
    assert shard_axes[0] == "cam"
    # Fleet stats replicated scalar equals the mean of per-camera means.
    np.testing.assert_allclose(
        float(stats.global_mean_depth), float(np.mean(np.asarray(stats.mean_depth))), rtol=1e-5
    )


@pytest.mark.slow
def test_sharded_matches_single_device(mesh):
    """The sharded result must equal the unsharded computation."""
    n_cams = 8
    bl, br = _inputs(n_cams, seed=3)
    cfg = PerceptionConfig(engine="wta", max_disp=16, internal_scale=1, run_enhance=False)
    rig = _rig()
    out_sharded, _ = multi_camera_step(bl, br, rig, cfg, mesh)

    from ocean_perception_tpu.models.perception import perception_step

    out_single = jax.vmap(lambda l, r: perception_step(l, r, rig, cfg).disparity)(bl, br)
    np.testing.assert_allclose(np.asarray(out_sharded.disparity), np.asarray(out_single), atol=1e-5)

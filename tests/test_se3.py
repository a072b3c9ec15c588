import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.core import se3
from ocean_perception_tpu.core import quaternion as quat


def random_twists(rng, n=50, scale=1.0):
    """Twists whose rotation part stays inside the principal branch (<pi)."""
    x = rng.normal(size=(n, 6)) * scale
    wn = np.linalg.norm(x[:, 3:], axis=-1, keepdims=True)
    x[:, 3:] *= np.minimum(1.0, 0.9 * np.pi / np.maximum(wn, 1e-9))
    return x


def test_skew_antisymmetric(rng):
    v = jnp.asarray(rng.normal(size=3))
    S = se3.skew(v)
    np.testing.assert_allclose(S, -S.T, atol=1e-12)
    w = jnp.asarray(rng.normal(size=3))
    np.testing.assert_allclose(S @ w, jnp.cross(v, w), atol=1e-12)


def test_so3_exp_log_roundtrip(rng):
    for scale in [1e-9, 1e-4, 0.1, 1.0, 3.0]:
        w = rng.normal(size=(20, 3))
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * scale
        wj = jnp.asarray(w)
        R = jax.vmap(se3.so3_exp)(wj)
        # Rotation matrices are orthonormal.
        eyes = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eyes, np.broadcast_to(np.eye(3), eyes.shape), atol=1e-9)
        w_back = jax.vmap(se3.so3_log)(R)
        np.testing.assert_allclose(w_back, w, atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    x = jnp.asarray(random_twists(rng, scale=1.0))
    T = jax.vmap(se3.se3_exp)(x)
    x_back = jax.vmap(se3.se3_log)(T)
    np.testing.assert_allclose(x_back, x, atol=1e-8)


def test_se3_inverse(rng):
    x = jnp.asarray(random_twists(rng, n=10))
    T = jax.vmap(se3.se3_exp)(x)
    Tinv = jax.vmap(se3.se3_inverse)(T)
    eye = jnp.einsum("nij,njk->nik", T, Tinv)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), eye.shape), atol=1e-10)


def test_se3_transform_matches_matrix(rng):
    x = jnp.asarray(rng.normal(size=6))
    T = se3.se3_exp(x)
    p = jnp.asarray(rng.normal(size=(7, 3)))
    ph = jnp.concatenate([p, jnp.ones((7, 1))], axis=-1)
    expected = (T @ ph.T).T[:, :3]
    np.testing.assert_allclose(se3.se3_transform(T, p), expected, atol=1e-12)


def test_so3_log_near_pi(rng):
    """Angles just under pi: log must return a vector that reproduces R."""
    axes = rng.normal(size=(20, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    for ang in [3.05, 3.12, np.pi - 1e-4]:
        w = jnp.asarray(axes * ang)
        R = jax.vmap(se3.so3_exp)(w)
        w_back = jax.vmap(se3.so3_log)(R)
        R_back = jax.vmap(se3.so3_exp)(w_back)
        np.testing.assert_allclose(R_back, R, atol=2e-4)


def test_identity_maps():
    T = se3.se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-12)
    np.testing.assert_allclose(se3.se3_log(jnp.eye(4)), np.zeros(6), atol=1e-12)


def test_gravity_axis():
    axis, unit = se3.gravity_axis([0.0, 9.81, 0.0])
    assert axis == 1
    np.testing.assert_allclose(unit, [0, 1, 0])
    axis, unit = se3.gravity_axis([0.0, 0.0, -9.81])
    assert axis == 2
    np.testing.assert_allclose(unit, [0, 0, -1])
    with pytest.raises(ValueError):
        se3.gravity_axis([0.0, 0.0, 0.0])


def test_quaternion_roundtrips(rng):
    w = rng.normal(size=(30, 3))
    q = jax.vmap(quat.quat_exp)(jnp.asarray(w))
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-12)
    w_back = jax.vmap(quat.quat_log)(q)
    # quat_log returns the shortest-arc equivalent rotation vector.
    R_orig = jax.vmap(se3.so3_exp)(jnp.asarray(w))
    R_back = jax.vmap(se3.so3_exp)(w_back)
    np.testing.assert_allclose(R_back, R_orig, atol=1e-9)


def test_quat_matrix_consistency(rng):
    w = jnp.asarray(rng.normal(size=(25, 3)))
    q = jax.vmap(quat.quat_exp)(w)
    R_q = jax.vmap(quat.quat_to_matrix)(q)
    R_e = jax.vmap(se3.so3_exp)(w)
    np.testing.assert_allclose(R_q, R_e, atol=1e-9)
    q_back = jax.vmap(quat.matrix_to_quat)(R_q)
    # q and -q are the same rotation; matrix_to_quat returns w>=0 branch.
    sign = np.sign(np.asarray(q[:, 0:1]))
    np.testing.assert_allclose(q_back, q * sign, atol=1e-7)


def test_quat_rotate_matches_matrix(rng):
    w = jnp.asarray(rng.normal(size=3))
    q = quat.quat_exp(w)
    v = jnp.asarray(rng.normal(size=(5, 3)))
    np.testing.assert_allclose(
        quat.quat_rotate(q, v), (quat.quat_to_matrix(q) @ v.T).T, atol=1e-10
    )

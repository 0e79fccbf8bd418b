import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from densemonoslam_tpu.utils import se3


def random_twists(rng, n, scale=1.0):
    return rng.normal(0, scale, (n, 6)).astype(np.float32)


def test_so3_exp_matches_scipy(rng):
    w = rng.normal(0, 1.0, (32, 3)).astype(np.float32)
    R = jax.vmap(se3.so3_exp)(jnp.asarray(w))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(0, 0.8, (16, 3)).astype(np.float32)
    for wi in w:
        R = se3.so3_exp(jnp.asarray(wi))
        w2 = se3.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), wi, atol=1e-4)


def test_so3_small_angle():
    w = jnp.array([1e-6, -2e-6, 1e-7], jnp.float32)
    R = se3.so3_exp(w)
    assert not np.any(np.isnan(np.asarray(R)))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = random_twists(rng, 16, 0.5)
    for x in xi:
        T = se3.se3_exp(jnp.asarray(x))
        x2 = se3.se3_log(T)
        np.testing.assert_allclose(np.asarray(x2), x, atol=1e-4)


def test_se3_exp_is_rigid(rng):
    xi = jnp.asarray(random_twists(rng, 8, 1.0))
    T = jax.vmap(se3.se3_exp)(xi)
    T = np.asarray(T)
    for Ti in T:
        R = Ti[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
        np.testing.assert_allclose(Ti[3], [0, 0, 0, 1], atol=0)


def test_se3_inverse(rng):
    xi = jnp.asarray(random_twists(rng, 1, 0.7)[0])
    T = se3.se3_exp(xi)
    np.testing.assert_allclose(
        np.asarray(T @ se3.se3_inverse(T)), np.eye(4), atol=1e-5
    )


def test_transform_points(rng):
    xi = jnp.asarray(random_twists(rng, 1, 0.5)[0])
    T = se3.se3_exp(xi)
    p = jnp.asarray(rng.normal(0, 1, (10, 3)).astype(np.float32))
    q = se3.transform_points(T, p)
    hom = np.concatenate([np.asarray(p), np.ones((10, 1), np.float32)], axis=1)
    q_ref = (np.asarray(T) @ hom.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-5)


def test_apply_update_composition(rng):
    xi = jnp.asarray(random_twists(rng, 1, 0.3)[0])
    T0 = se3.se3_exp(jnp.asarray(random_twists(rng, 1, 0.3)[0]))
    T1 = se3.apply_update(T0, xi)
    np.testing.assert_allclose(
        np.asarray(T1), np.asarray(se3.se3_exp(xi) @ T0), atol=1e-6
    )


def test_orthonormalise(rng):
    R = se3.so3_exp(jnp.asarray([0.2, -0.1, 0.3], jnp.float32))
    noisy = R + 0.01 * jnp.asarray(rng.normal(0, 1, (3, 3)).astype(np.float32))
    Rn = se3.orthonormalise(noisy)
    Rn = np.asarray(Rn)
    np.testing.assert_allclose(Rn @ Rn.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(Rn) > 0.99


def test_jit_compatible():
    f = jax.jit(lambda x: se3.se3_log(se3.se3_exp(x)))
    x = jnp.array([0.1, 0.2, -0.1, 0.4, 0.0, -0.2], jnp.float32)
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(x), atol=1e-5)

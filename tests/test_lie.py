import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_tpu.core import lie


def rand_quat(key, shape=()):
    q = jax.random.normal(key, shape + (4,))
    return lie.quat_normalize(q)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(0)
    q = rand_quat(key, (32,))
    v = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    R = lie.quat_to_matrix(q)
    np.testing.assert_allclose(lie.quat_rotate(q, v),
                               jnp.einsum('nij,nj->ni', R, v), atol=1e-5)


def test_matrix_quat_roundtrip():
    key = jax.random.PRNGKey(2)
    q = rand_quat(key, (64,))
    q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(q) * np.asarray(q2), -1)),
                               1.0, atol=1e-5)


def test_so3_exp_log_roundtrip():
    phi = jax.random.normal(jax.random.PRNGKey(3), (64, 3))
    phi = phi / jnp.linalg.norm(phi, axis=-1, keepdims=True) * 2.5  # < pi
    phi = phi * jax.random.uniform(jax.random.PRNGKey(33), (64, 1))
    phi2 = lie.so3_log(lie.so3_exp(phi))
    np.testing.assert_allclose(phi, phi2, atol=1e-4)


def test_so3_exp_small_angle():
    phi = jnp.asarray([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]])
    q = lie.so3_exp(phi)
    np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-6)


def test_se3_compose_inverse():
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    T = lie.se3(rand_quat(k1, (16,)), jax.random.normal(k2, (16, 3)))
    I = lie.se3_compose(T, lie.se3_inverse(T))
    np.testing.assert_allclose(np.abs(I[:, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(I[:, 1:], 0.0, atol=1e-5)


def test_se3_apply_matches_matrix():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    T = lie.se3(rand_quat(k1, (8,)), jax.random.normal(k2, (8, 3)))
    p = jax.random.normal(k3, (8, 3))
    M = lie.se3_matrix(T)
    ph = jnp.concatenate([p, jnp.ones((8, 1))], -1)
    np.testing.assert_allclose(lie.se3_apply(T, p),
                               jnp.einsum('nij,nj->ni', M, ph)[:, :3], atol=1e-5)


def test_se3_exp_log_roundtrip():
    xi = jax.random.normal(jax.random.PRNGKey(6), (32, 6)) * 0.8
    xi2 = lie.se3_log(lie.se3_exp(xi))
    np.testing.assert_allclose(xi, xi2, atol=1e-3)


def test_se3_exp_zero_is_identity():
    T = lie.se3_exp(jnp.zeros((6,)))
    np.testing.assert_allclose(T, jnp.asarray([1., 0, 0, 0, 0, 0, 0]), atol=1e-7)


def test_se3_retract_left_multiplied():
    T = lie.se3(rand_quat(jax.random.PRNGKey(7), ()), jnp.asarray([1., 2., 3.]))
    xi = jnp.asarray([0.1, -0.2, 0.05, 0.02, 0.03, -0.01])
    expected = lie.se3_compose(lie.se3_exp(xi), T)
    np.testing.assert_allclose(lie.se3_retract(T, xi), expected, atol=1e-6)


def test_sim3_apply_scale():
    S = lie.sim3_identity()
    S = S.at[7].set(2.0).at[4:7].set(jnp.asarray([1.0, 0.0, 0.0]))
    p = jnp.asarray([[1.0, 1.0, 1.0]])
    np.testing.assert_allclose(lie.sim3_apply(S, p), [[3.0, 2.0, 2.0]], atol=1e-6)


def test_sim3_compose_inverse():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(8), 3)
    q = rand_quat(k1, (16,))
    t = jax.random.normal(k2, (16, 3))
    s = jnp.exp(jax.random.normal(k3, (16,)) * 0.3)
    S = jnp.concatenate([q, t, s[:, None]], -1)
    I = lie.sim3_compose(S, lie.sim3_inverse(S))
    np.testing.assert_allclose(np.abs(I[:, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(I[:, 1:7], 0.0, atol=1e-4)
    np.testing.assert_allclose(I[:, 7], 1.0, atol=1e-5)


def test_sim3_exp_reduces_to_se3():
    """With sigma=0 and scale 1, sim3_exp must match se3_exp."""
    xi6 = jax.random.normal(jax.random.PRNGKey(9), (16, 6)) * 0.5
    xi7 = jnp.concatenate([xi6, jnp.zeros((16, 1))], -1)
    S = lie.sim3_exp(xi7)
    T = lie.se3_exp(xi6)
    np.testing.assert_allclose(S[:, :7], T, atol=1e-4)
    np.testing.assert_allclose(S[:, 7], 1.0, atol=1e-6)


def test_sim3_exp_consistency_numeric():
    """sim3_exp should satisfy exp((1+eps)xi) ~= exp(eps xi) * exp(xi)."""
    xi = jnp.asarray([0.3, -0.1, 0.2, 0.15, -0.25, 0.1, 0.2])
    a = lie.sim3_exp(1.5 * xi)
    b = lie.sim3_compose(lie.sim3_exp(0.5 * xi), lie.sim3_exp(xi))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_sim3_to_se3():
    q = lie.quat_normalize(jnp.asarray([0.9, 0.1, 0.2, 0.3]))
    S = jnp.concatenate([q, jnp.asarray([2.0, 4.0, 6.0, 2.0])])
    T = lie.sim3_to_se3(S)
    np.testing.assert_allclose(lie.se3_t(T), jnp.asarray([1.0, 2.0, 3.0]), atol=1e-6)


def test_jit_and_vmap_compatible():
    f = jax.jit(jax.vmap(lambda T, p: lie.se3_apply(T, p)))
    T = lie.se3_identity((4,))
    p = jnp.ones((4, 3))
    np.testing.assert_allclose(f(T, p), p, atol=1e-6)

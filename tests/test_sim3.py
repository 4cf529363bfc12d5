import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.solvers import sim3 as sim3_mod

K = jnp.asarray([500.0, 500.0, 320.0, 240.0])


def _sim3(q, t, s):
    return jnp.concatenate([lie.quat_normalize(jnp.asarray(q)),
                            jnp.asarray(t, jnp.float32),
                            jnp.asarray([s], jnp.float32)])


def test_sim3_log_exp_roundtrip():
    xi = jax.random.normal(jax.random.PRNGKey(0), (32, 7)) * 0.5
    xi2 = lie.sim3_log(lie.sim3_exp(xi))
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-3)


def test_horn_exact():
    rng = np.random.RandomState(0)
    S_true = _sim3([0.95, 0.1, -0.2, 0.15], [0.4, -0.2, 0.3], 1.3)
    p2 = jnp.asarray(rng.randn(16, 3) + [0, 0, 4], jnp.float32)
    p1 = lie.sim3_apply(S_true[None], p2)
    S = sim3_mod.horn_sim3(p1, p2, fix_scale=False)
    np.testing.assert_allclose(float(lie.sim3_s(S)), 1.3, atol=1e-3)
    p1b = lie.sim3_apply(S[None], p2)
    np.testing.assert_allclose(np.asarray(p1b), np.asarray(p1), atol=1e-3)


def test_horn_fix_scale():
    rng = np.random.RandomState(1)
    S_true = _sim3([1.0, 0.05, 0.02, -0.04], [0.2, 0.1, -0.1], 1.0)
    p2 = jnp.asarray(rng.randn(16, 3) + [0, 0, 4], jnp.float32)
    p1 = lie.sim3_apply(S_true[None], p2)
    S = sim3_mod.horn_sim3(p1, p2, fix_scale=True)
    assert float(lie.sim3_s(S)) == 1.0
    np.testing.assert_allclose(np.asarray(lie.sim3_apply(S[None], p2)),
                               np.asarray(p1), atol=1e-3)


def test_sim3_ransac_with_outliers():
    rng = np.random.RandomState(2)
    n = 60
    S_true = _sim3([0.98, 0.05, -0.1, 0.08], [0.3, -0.1, 0.2], 0.8)
    p2 = jnp.asarray(rng.randn(n, 3) * [1.5, 1.5, 0.5] + [0, 0, 5], jnp.float32)
    p1 = lie.sim3_apply(S_true[None], p2)
    # corrupt 20 correspondences
    bad = rng.choice(n, 20, replace=False)
    p1 = p1.at[bad].add(jnp.asarray(rng.randn(20, 3) * 2, jnp.float32))
    uv1 = camera.project(K, p1)
    uv2 = camera.project(K, p2)
    res = sim3_mod.sim3_ransac(
        jax.random.PRNGKey(0), p1, p2, uv1, uv2, jnp.ones(n, bool), K,
        jnp.full((n,), 9.21), jnp.full((n,), 9.21), fix_scale=False)
    assert bool(res.ok)
    assert float(lie.sim3_s(res.S12)) == np.float32(0.8) or \
        abs(float(lie.sim3_s(res.S12)) - 0.8) < 0.02
    inl = np.asarray(res.inliers)
    assert inl[bad].sum() <= 2


def test_optimize_sim3_refines():
    rng = np.random.RandomState(3)
    n = 50
    S_true = _sim3([0.99, 0.02, -0.05, 0.03], [0.2, -0.05, 0.1], 1.15)
    p2 = jnp.asarray(rng.randn(n, 3) * [1.5, 1.5, 0.5] + [0, 0, 5], jnp.float32)
    p1 = lie.sim3_apply(S_true[None], p2)
    uv1 = camera.project(K, p1) + jnp.asarray(rng.randn(n, 2) * 0.3, jnp.float32)
    uv2 = camera.project(K, p2) + jnp.asarray(rng.randn(n, 2) * 0.3, jnp.float32)
    S0 = lie.sim3_retract(S_true, jnp.asarray([0.05, -0.03, 0.02, 0.02,
                                               -0.01, 0.03, 0.05]))
    S, n_in, inl = sim3_mod.optimize_sim3(
        S0, p1, p2, uv1, uv2, jnp.ones(n, bool), K,
        jnp.ones(n), jnp.ones(n), fix_scale=False)
    assert int(n_in) > 40
    err = lie.sim3_compose(S, lie.sim3_inverse(S_true))
    assert float(jnp.linalg.norm(lie.sim3_t(err))) < 0.02
    assert abs(float(lie.sim3_s(err)) - 1.0) < 0.02

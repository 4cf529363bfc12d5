import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.solvers import epnp

K = jnp.asarray([500.0, 500.0, 320.0, 240.0])


def _setup(n=80, noise=0.5, seed=0):
    rng = np.random.RandomState(seed)
    pw = jnp.asarray(rng.randn(n, 3) * [2, 2, 1] + [0, 0, 6], jnp.float32)
    T = lie.se3_compose(
        lie.se3_exp(jnp.asarray([0.1, -0.2, 0.15, 0.1, -0.05, 0.08])),
        lie.se3_identity())
    uv = camera.project(K, lie.se3_apply(T, pw))
    uv = uv + jnp.asarray(rng.randn(n, 2) * noise, jnp.float32)
    return pw, uv, T


def _terr(a, b):
    d = lie.se3_compose(a, lie.se3_inverse(b))
    return float(jnp.linalg.norm(lie.se3_t(d)))


def test_epnp_clean():
    pw, uv, T = _setup(noise=0.0)
    T_est = epnp.epnp_solve(pw, uv, K)
    assert _terr(T_est, T) < 0.01, _terr(T_est, T)


def test_epnp_noisy():
    pw, uv, T = _setup(noise=1.0)
    T_est = epnp.epnp_solve(pw, uv, K)
    assert _terr(T_est, T) < 0.05


def test_pnp_ransac_outliers():
    pw, uv, T = _setup(n=100, noise=0.5, seed=1)
    rng = np.random.RandomState(2)
    bad = rng.choice(100, 35, replace=False)
    uv = np.asarray(uv).copy()
    uv[bad] += rng.randn(35, 2) * 80 + 30
    res = jax.jit(lambda k, p, u, v: epnp.pnp_ransac(
        k, p, u, v, K, jnp.full((100,), 5.991)))(
        jax.random.PRNGKey(0), pw, jnp.asarray(uv), jnp.ones(100, bool))
    assert bool(res.ok)
    assert _terr(res.T, T) < 0.05, _terr(res.T, T)
    inl = np.asarray(res.inliers)
    assert inl[bad].sum() <= 3
    assert int(res.n_inliers) > 50

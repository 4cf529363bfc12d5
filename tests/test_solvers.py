import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import BAConfig, InitConfig
from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.solvers import pose_opt, triangulate, twoview

K = jnp.asarray([500.0, 500.0, 320.0, 240.0])


def _scene(n, seed=0, depth=5.0, spread=2.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(n, 3) * [spread, spread, spread * 0.4]
                       + [0, 0, depth], jnp.float32)


def test_triangulate_exact():
    pts = _scene(64)
    T1 = lie.se3_identity()
    T2 = lie.se3_from_Rt(jnp.eye(3), jnp.asarray([-0.2, 0.0, 0.0]))
    xn1 = lie.se3_apply(T1, pts)
    xn1 = xn1[:, :2] / xn1[:, 2:]
    p2 = lie.se3_apply(T2, pts)
    xn2 = p2[:, :2] / p2[:, 2:]
    out = triangulate.triangulate_dlt(T1[None], T2[None], xn1, xn2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-2)


def test_twoview_init_general_scene():
    pts = _scene(200, seed=1)
    T2 = lie.se3_compose(lie.se3_exp(jnp.asarray([0.0, 0, 0, 0, 0.03, 0.01])),
                         lie.se3_from_Rt(jnp.eye(3), jnp.asarray([-0.3, 0.02, 0.0])))
    uv1 = camera.project(K, pts)
    uv2 = camera.project(K, lie.se3_apply(T2, pts))
    rng = np.random.RandomState(2)
    uv1 = uv1 + jnp.asarray(rng.randn(200, 2) * 0.3, jnp.float32)
    uv2 = uv2 + jnp.asarray(rng.randn(200, 2) * 0.3, jnp.float32)
    valid = jnp.ones(200, bool)
    res = twoview.initialize(jax.random.PRNGKey(0), K, uv1, uv2, valid,
                             InitConfig(ransac_iters=64))
    assert bool(res.ok), "init failed on well-conditioned scene"
    assert not bool(res.used_h)
    # direction of recovered translation matches (up to scale)
    t_est = np.asarray(lie.se3_t(res.T21))
    t_true = np.asarray(lie.se3_t(T2))
    cos = abs(np.dot(t_est, t_true) / np.linalg.norm(t_est) / np.linalg.norm(t_true))
    assert cos > 0.99, f"translation direction cos {cos}"
    assert int(jnp.sum(res.good)) > 120


def test_twoview_init_planar_scene():
    rng = np.random.RandomState(3)
    xy = rng.rand(200, 2) * 4 - 2
    pts = jnp.asarray(np.concatenate([xy, np.full((200, 1), 4.0)], -1), jnp.float32)
    # tilt the plane so H decomposition is well-posed
    tilt = lie.so3_exp(jnp.asarray([0.4, 0.2, 0.0]))
    pts = lie.quat_rotate(tilt[None], pts - jnp.asarray([0, 0, 4.0])) + jnp.asarray([0, 0, 4.0])
    T2 = lie.se3_compose(lie.se3_exp(jnp.asarray([0.0, 0, 0, 0, 0.04, 0.0])),
                         lie.se3_from_Rt(jnp.eye(3), jnp.asarray([-0.25, 0.0, 0.05])))
    uv1 = camera.project(K, pts) + jnp.asarray(rng.randn(200, 2) * 0.3, jnp.float32)
    uv2 = camera.project(K, lie.se3_apply(T2, pts)) + jnp.asarray(rng.randn(200, 2) * 0.3, jnp.float32)
    res = twoview.initialize(jax.random.PRNGKey(1), K, uv1, uv2,
                             jnp.ones(200, bool), InitConfig(ransac_iters=64))
    assert bool(res.used_h), "planar scene should pick homography"
    assert bool(res.ok)
    t_est = np.asarray(lie.se3_t(res.T21))
    t_true = np.asarray(lie.se3_t(T2))
    cos = abs(np.dot(t_est, t_true) / np.linalg.norm(t_est) / np.linalg.norm(t_true))
    assert cos > 0.98, f"translation direction cos {cos}"


def test_twoview_rejects_pure_rotation():
    pts = _scene(200, seed=4)
    T2 = lie.se3_from_Rt(np.asarray(lie.quat_to_matrix(lie.so3_exp(jnp.asarray([0.0, 0.05, 0.0])))),
                         jnp.zeros(3))
    uv1 = camera.project(K, pts)
    uv2 = camera.project(K, lie.se3_apply(T2, pts))
    res = twoview.initialize(jax.random.PRNGKey(2), K, uv1, uv2,
                             jnp.ones(200, bool), InitConfig(ransac_iters=64))
    assert not bool(res.ok), "pure rotation must not initialize (no parallax)"


def test_pose_optimize_converges():
    pts = _scene(150, seed=5)
    T_true = lie.se3_compose(lie.se3_exp(jnp.asarray([0.05, -0.03, 0.02, 0.02, -0.01, 0.015])),
                             lie.se3_identity())
    uv = camera.project(K, lie.se3_apply(T_true, pts))
    rng = np.random.RandomState(6)
    uv = uv + jnp.asarray(rng.randn(150, 2) * 0.5, jnp.float32)
    # 15% outliers
    out_idx = rng.choice(150, 22, replace=False)
    uv = uv.at[out_idx].add(jnp.asarray(rng.randn(22, 2) * 40, jnp.float32))
    T0 = lie.se3_identity()
    res = pose_opt.pose_optimize(
        T0, pts, uv, jnp.zeros(150), jnp.ones(150), jnp.ones(150, bool),
        jnp.zeros(150, bool), K, 0.0, BAConfig())
    err = lie.se3_compose(res.T, lie.se3_inverse(T_true))
    dt = float(jnp.linalg.norm(lie.se3_t(err)))
    dr = float(jnp.linalg.norm(lie.so3_log(lie.se3_q(err))))
    assert dt < 5e-3, f"translation error {dt}"
    assert dr < 2e-3, f"rotation error {dr}"
    assert int(res.n_inliers) > 110
    # most injected outliers classified out
    inl = np.asarray(res.inliers)
    assert inl[out_idx].sum() <= 4


def test_pose_optimize_stereo():
    pts = _scene(100, seed=7)
    bf = 40.0
    T_true = lie.se3_from_Rt(jnp.eye(3), jnp.asarray([0.1, -0.05, 0.02]))
    pc = lie.se3_apply(T_true, pts)
    uv = camera.project(K, pc)
    ur = camera.stereo_right_u(K, bf, uv, pc[:, 2])
    res = pose_opt.pose_optimize(
        lie.se3_identity(), pts, uv, ur, jnp.ones(100), jnp.ones(100, bool),
        jnp.ones(100, bool), K, bf, BAConfig())
    err = lie.se3_compose(res.T, lie.se3_inverse(T_true))
    assert float(jnp.linalg.norm(lie.se3_t(err))) < 1e-3
    assert int(res.n_inliers) == 100

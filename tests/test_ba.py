import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.ba.schur import BAProblem, ba_solve
from orb_slam2_tpu.core import camera, lie

K = jnp.asarray([500.0, 500.0, 320.0, 240.0])


def _make_problem(n_cams=6, n_pts=120, noise_px=0.5, pose_noise=0.05,
                  pt_noise=0.05, stereo=False, seed=0):
    rng = np.random.RandomState(seed)
    pts_gt = jnp.asarray(rng.randn(n_pts, 3) * [2.5, 2.5, 1.0] + [0, 0, 6],
                         jnp.float32)
    poses_gt = []
    for c in range(n_cams):
        t = jnp.asarray([0.3 * c - 0.75, 0.05 * rng.randn(), 0.02 * c],
                        jnp.float32)
        xi = jnp.asarray(np.concatenate([[0, 0, 0], rng.randn(3) * 0.02]),
                         jnp.float32)
        poses_gt.append(lie.se3_compose(lie.se3_exp(xi),
                                        lie.se3_from_Rt(jnp.eye(3), -t)))
    poses_gt = jnp.stack(poses_gt)

    obs_cam, obs_pid, obs_uv, obs_ur = [], [], [], []
    bf = 40.0
    for c in range(n_cams):
        pc = lie.se3_apply(poses_gt[c], pts_gt)
        uv = camera.project(K, pc)
        uv = uv + jnp.asarray(rng.randn(n_pts, 2) * noise_px, jnp.float32)
        obs_cam.append(jnp.full((n_pts,), c, jnp.int32))
        obs_pid.append(jnp.arange(n_pts, dtype=jnp.int32))
        obs_uv.append(uv)
        if stereo:
            obs_ur.append(camera.stereo_right_u(K, bf, uv, pc[:, 2]))
        else:
            obs_ur.append(jnp.full((n_pts,), -1.0))
    # perturb initial guess (keep cam0 at gt: it is the gauge)
    cam_noise = jnp.asarray(
        np.concatenate([np.zeros((1, 6)),
                        rng.randn(n_cams - 1, 6) * pose_noise]), jnp.float32)
    cam_init = jax.vmap(lie.se3_retract)(poses_gt, cam_noise)
    pts_init = pts_gt + jnp.asarray(rng.randn(n_pts, 3) * pt_noise, jnp.float32)

    prob = BAProblem(
        cam_pose=cam_init,
        cam_var=jnp.asarray([False] + [True] * (n_cams - 1)),
        points=pts_init,
        pt_var=jnp.ones((n_pts,), bool),
        obs_cam=jnp.concatenate(obs_cam),
        obs_pid=jnp.concatenate(obs_pid),
        obs_uv=jnp.concatenate(obs_uv),
        obs_ur=jnp.concatenate(obs_ur),
        obs_w=jnp.ones((n_cams * n_pts,)),
        K=K, bf=jnp.asarray(bf))
    return prob, poses_gt, pts_gt


def _pose_err(a, b, align_scale=True):
    """Max camera-center error after Sim3 alignment (mono BA leaves a scale
    gauge freedom even with one fixed camera, like the reference)."""
    from orb_slam2_tpu.io.evaluate import umeyama
    ca = np.asarray(jax.vmap(
        lambda T: -lie.quat_rotate(lie.quat_conj(T[:4]), T[4:7]))(a))
    cb = np.asarray(jax.vmap(
        lambda T: -lie.quat_rotate(lie.quat_conj(T[:4]), T[4:7]))(b))
    s, R, t = umeyama(ca, cb, align_scale)
    aligned = (s * (R @ ca.T)).T + t
    return float(np.linalg.norm(aligned - cb, axis=-1).max())


def test_ba_converges_mono():
    prob, poses_gt, pts_gt = _make_problem()
    res = jax.jit(lambda p: ba_solve(p, n_outer=12, n_cg=30))(prob)
    err0 = _pose_err(prob.cam_pose, poses_gt)
    err1 = _pose_err(res.cam_pose, poses_gt)
    assert err1 < 0.01, f"pose err {err1} (init {err0})"
    # chi2 should reach the noise floor ~ 2*R*sigma^2
    assert float(jnp.sum(res.chi2)) < 2.5 * prob.obs_uv.shape[0] * 0.5 ** 2
    assert float(jnp.mean(res.inlier)) > 0.97


def test_ba_converges_stereo():
    prob, poses_gt, pts_gt = _make_problem(stereo=True, noise_px=0.3)
    res = jax.jit(lambda p: ba_solve(p, n_outer=12, n_cg=30))(prob)
    assert _pose_err(res.cam_pose, poses_gt) < 0.01


def test_ba_rejects_outliers():
    prob, poses_gt, pts_gt = _make_problem(noise_px=0.3)
    rng = np.random.RandomState(5)
    bad = rng.choice(prob.obs_uv.shape[0], 60, replace=False)
    uv = np.asarray(prob.obs_uv).copy()
    uv[bad] += rng.randn(60, 2) * 50 + 20
    prob = prob._replace(obs_uv=jnp.asarray(uv))
    res = jax.jit(lambda p: ba_solve(p, n_outer=15, n_cg=30))(prob)
    assert _pose_err(res.cam_pose, poses_gt) < 0.02
    inl = np.asarray(res.inlier)
    assert inl[bad].mean() < 0.2, "outliers not flagged"


def test_ba_respects_fixed_cameras():
    prob, poses_gt, pts_gt = _make_problem()
    res = jax.jit(lambda p: ba_solve(p, n_outer=5, n_cg=20))(prob)
    np.testing.assert_allclose(np.asarray(res.cam_pose[0]),
                               np.asarray(prob.cam_pose[0]), atol=1e-7)


def test_ba_inactive_obs_ignored():
    prob, poses_gt, pts_gt = _make_problem()
    # deactivate half the observations; should still converge
    w = np.asarray(prob.obs_w).copy()
    w[::2] = 0.0
    prob = prob._replace(obs_w=jnp.asarray(w))
    res = jax.jit(lambda p: ba_solve(p, n_outer=12, n_cg=30))(prob)
    assert _pose_err(res.cam_pose, poses_gt) < 0.02


# ---------------------------------------------------------------------------
# dense-Schur solver (ba_solve_dense): the production single-chip path
# ---------------------------------------------------------------------------

def _mirror_for(n_cams, n_pts):
    """pt_obs_r for the all-cams-see-all-points layout: r = c*n_pts + p."""
    return (jnp.arange(n_cams)[None, :] * n_pts +
            jnp.arange(n_pts)[:, None]).astype(jnp.int32)


def test_ba_dense_converges_mono():
    prob, poses_gt, pts_gt = _make_problem()
    mir = _mirror_for(6, 120)
    res = jax.jit(lambda p: __import__(
        'orb_slam2_tpu.ba.schur', fromlist=['x']).ba_solve_dense(
        p, mir, n_per_cam=120, n_outer=10, chunk=120))(prob)
    err1 = _pose_err(res.cam_pose, poses_gt)
    assert err1 < 0.01, f"pose err {err1}"
    assert float(jnp.mean(res.inlier)) > 0.97


def test_ba_dense_converges_stereo():
    from orb_slam2_tpu.ba.schur import ba_solve_dense
    prob, poses_gt, pts_gt = _make_problem(stereo=True, noise_px=0.3)
    mir = _mirror_for(6, 120)
    res = jax.jit(lambda p: ba_solve_dense(
        p, mir, n_per_cam=120, n_outer=10, chunk=120))(prob)
    assert _pose_err(res.cam_pose, poses_gt) < 0.01


def test_ba_dense_rejects_outliers():
    from orb_slam2_tpu.ba.schur import ba_solve_dense
    prob, poses_gt, pts_gt = _make_problem(noise_px=0.3)
    rng = np.random.RandomState(5)
    bad = rng.choice(prob.obs_uv.shape[0], 60, replace=False)
    uv = np.asarray(prob.obs_uv).copy()
    uv[bad] += rng.randn(60, 2) * 50 + 20
    prob = prob._replace(obs_uv=jnp.asarray(uv))
    mir = _mirror_for(6, 120)
    res = jax.jit(lambda p: ba_solve_dense(
        p, mir, n_per_cam=120, n_outer=12, chunk=120))(prob)
    assert _pose_err(res.cam_pose, poses_gt) < 0.02
    assert np.asarray(res.inlier)[bad].mean() < 0.2


def test_ba_dense_respects_fixed_and_inactive():
    from orb_slam2_tpu.ba.schur import ba_solve_dense
    prob, poses_gt, pts_gt = _make_problem()
    # deactivate half the observations (must also vanish from the mirror)
    w = np.asarray(prob.obs_w).copy()
    w[::2] = 0.0
    prob = prob._replace(obs_w=jnp.asarray(w))
    mir = np.asarray(_mirror_for(6, 120))
    mir = np.where(w[np.clip(mir, 0, None)] > 0, mir, -1)
    res = jax.jit(lambda p: ba_solve_dense(
        p, jnp.asarray(mir), n_per_cam=120, n_outer=10, chunk=120))(prob)
    assert _pose_err(res.cam_pose, poses_gt) < 0.02
    np.testing.assert_allclose(np.asarray(res.cam_pose[0]),
                               np.asarray(prob.cam_pose[0]), atol=1e-7)


def test_ba_dense_matches_cg_solver():
    """Exact-solve LM and CG LM must land on the same optimum."""
    from orb_slam2_tpu.ba.schur import ba_solve_dense
    prob, poses_gt, pts_gt = _make_problem(noise_px=0.2)
    mir = _mirror_for(6, 120)
    r1 = jax.jit(lambda p: ba_solve(p, n_outer=15, n_cg=40))(prob)
    r2 = jax.jit(lambda p: ba_solve_dense(
        p, mir, n_per_cam=120, n_outer=10, chunk=120))(prob)
    assert _pose_err(r1.cam_pose, r2.cam_pose) < 5e-3

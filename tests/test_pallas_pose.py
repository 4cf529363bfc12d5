"""Single-kernel Pallas pose optimizer vs the jnp LM reference.

Exact bit-equality is not expected (Cholesky vs lax solve, different
reduction order); both must converge to the ground-truth pose and classify
inliers consistently.
"""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import BAConfig
from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.solvers.pallas_pose import pose_optimize_pallas
from orb_slam2_tpu.solvers.pose_opt import pose_optimize

K4 = (500.0, 500.0, 320.0, 240.0)
K = jnp.asarray(K4)
BF = 40.0


def _problem(n=512, outliers=40, stereo=False, seed=0):
    rng = np.random.RandomState(seed)
    pw = jnp.asarray(rng.randn(n, 3) * [2.0, 2.0, 1.0] + [0, 0, 6],
                     jnp.float32)
    T_gt = lie.se3_exp(jnp.asarray([0.1, -0.05, 0.02, 0.03, -0.02, 0.01]))
    pc = lie.se3_apply(T_gt, pw)
    uv = camera.project(K, pc) + jnp.asarray(rng.randn(n, 2) * 0.5,
                                             jnp.float32)
    ur = (camera.stereo_right_u(K, BF, uv, pc[:, 2])
          if stereo else jnp.full((n,), -1.0))
    # inject gross outliers
    idx = rng.choice(n, outliers, replace=False)
    uv = uv.at[idx].add(jnp.asarray(rng.randn(outliers, 2) * 40 + 20,
                                    jnp.float32))
    T0 = lie.se3_retract(T_gt, jnp.asarray([0.05, 0.02, -0.03,
                                            0.02, 0.01, -0.015]))
    valid = jnp.ones((n,), bool)
    inv_sigma2 = jnp.ones((n,))
    is_st = jnp.full((n,), stereo)
    return T_gt, T0, pw, uv, ur, inv_sigma2, valid, is_st


def _err(Ta, Tb):
    d = lie.se3_compose(Ta, lie.se3_inverse(Tb))
    return float(jnp.linalg.norm(lie.se3_log(d)))


def _run_both(stereo):
    cfg = BAConfig()
    T_gt, T0, pw, uv, ur, isig, valid, is_st = _problem(stereo=stereo)
    r_ref = pose_optimize(T0, pw, uv, ur, isig, valid, is_st, K, BF, cfg)
    r_pal = pose_optimize_pallas(T0, pw, uv, ur, isig, valid, is_st,
                                 K4, BF, cfg)
    return T_gt, r_ref, r_pal


def test_pallas_pose_matches_reference_mono():
    T_gt, r_ref, r_pal = _run_both(stereo=False)
    assert _err(r_pal.T, T_gt) < 5e-3, _err(r_pal.T, T_gt)
    assert _err(r_pal.T, r_ref.T) < 5e-3
    # inlier classification agrees on the vast majority of points
    agree = np.mean(np.asarray(r_pal.inliers) == np.asarray(r_ref.inliers))
    assert agree > 0.97, agree


def test_pallas_pose_matches_reference_stereo():
    T_gt, r_ref, r_pal = _run_both(stereo=True)
    assert _err(r_pal.T, T_gt) < 5e-3
    assert _err(r_pal.T, r_ref.T) < 5e-3
    agree = np.mean(np.asarray(r_pal.inliers) == np.asarray(r_ref.inliers))
    assert agree > 0.97, agree

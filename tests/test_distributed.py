"""Distributed (multi-device SPMD) paths on the 8-device CPU mesh
(conftest.py forces XLA_FLAGS=--xla_force_host_platform_device_count=8).

Asserts the sharded solvers are numerically equivalent to their
single-device counterparts on realistically sized problems — the guarantee
that lets the same program scale over ICI on a real pod slice."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_tpu.ba.posegraph import optimize_pose_graph
from orb_slam2_tpu.ba.schur import ba_solve
from orb_slam2_tpu.ba.schur import BAProblem
from orb_slam2_tpu.distributed.ba import (distributed_ba_solve,
                                          distributed_ba_solve_sharded,
                                          make_obs_mesh, make_pt_mesh)
from orb_slam2_tpu.distributed.posegraph import (distributed_pose_graph,
                                                 make_edge_mesh)

from tests.test_ba import _make_problem, _pose_err
from tests.test_posegraph import _err, _ring_problem


@pytest.fixture(scope="module")
def obs_mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_obs_mesh(8)


def test_distributed_ba_matches_single_device(obs_mesh):
    """Sharded BA == single-device BA on a 64-cam / 4k-point problem."""
    prob, poses_gt, pts_gt = _make_problem(n_cams=64, n_pts=4096,
                                           noise_px=0.4, pose_noise=0.02,
                                           pt_noise=0.02, seed=11)
    r1 = jax.jit(lambda p: ba_solve(p, n_outer=8, n_cg=25))(prob)
    r2 = distributed_ba_solve(prob, obs_mesh, n_outer=8, n_cg=25)
    # identical math up to reduction order -> tight tolerance
    assert _pose_err(r1.cam_pose, r2.cam_pose, align_scale=False) < 1e-4
    np.testing.assert_allclose(np.asarray(r2.points), np.asarray(r1.points),
                               atol=1e-3)


def test_distributed_ba_converges_large(obs_mesh):
    prob, poses_gt, _ = _make_problem(n_cams=64, n_pts=4096, noise_px=0.4,
                                      pose_noise=0.02, pt_noise=0.02, seed=3)
    res = distributed_ba_solve(prob, obs_mesh, n_outer=12, n_cg=40)
    assert _pose_err(res.cam_pose, poses_gt) < 0.03
    assert float(jnp.mean(res.inlier)) > 0.95


def _to_point_major(prob, n_cams, n_pts):
    """Reorder a full-grid camera-major problem (row = c*P + p) into
    point-major layout (row = p*C + c), i.e. D = n_cams observer slots per
    point — the layout `distributed_ba_solve_sharded` partitions."""
    perm = (np.arange(n_pts)[:, None] * 0 +
            np.arange(n_cams)[None, :] * n_pts +
            np.arange(n_pts)[:, None]).reshape(-1)
    g = lambda x: x[perm]
    return prob._replace(obs_cam=g(prob.obs_cam), obs_pid=g(prob.obs_pid),
                         obs_uv=g(prob.obs_uv), obs_ur=g(prob.obs_ur),
                         obs_w=g(prob.obs_w))


def test_landmark_sharded_ba_matches_single_device(obs_mesh):
    """v2 map-block partitioning: landmarks + their rows sharded, cameras
    replicated, point work owner-computed — must agree with the single-device
    solve on the same point-major problem."""
    # stereo observations pin the scale gauge — a mono problem's free gauge
    # wanders under different floating-point reduction orders, which is not
    # the equivalence under test
    C, P = 16, 4096
    prob, poses_gt, _ = _make_problem(n_cams=C, n_pts=P, noise_px=0.4,
                                      pose_noise=0.02, pt_noise=0.02,
                                      stereo=True, seed=7)
    pm = _to_point_major(prob, C, P)
    mesh = make_pt_mesh(8)
    r1 = jax.jit(lambda p: ba_solve(p, n_outer=8, n_cg=25))(pm)
    r2 = distributed_ba_solve_sharded(pm, mesh, D=C, n_outer=8, n_cg=25)
    assert _pose_err(r1.cam_pose, r2.cam_pose, align_scale=False) < 1e-3
    np.testing.assert_allclose(np.asarray(r2.points), np.asarray(r1.points),
                               atol=1e-2)
    assert _pose_err(r2.cam_pose, poses_gt) < 0.05


def test_distributed_pose_graph_matches_single(obs_mesh):
    mesh = make_edge_mesh(8)
    prob, gt = _ring_problem(n=48, drift=0.015, seed=2)
    n1, _ = jax.jit(lambda p: optimize_pose_graph(p, n_outer=25, n_cg=40))(prob)
    n2, _ = distributed_pose_graph(prob, mesh, n_outer=25, n_cg=40)
    assert _err(n1, gt) < 0.1
    d = np.linalg.norm(np.asarray(n1) - np.asarray(n2), axis=-1).max()
    assert d < 1e-3, f"sharded pose graph diverged from single-device: {d}"

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.ba import posegraph
from orb_slam2_tpu.core import lie


def _ring_problem(n=12, drift=0.03, seed=0, fix_scale=False):
    """Odometry ring with accumulated drift + one loop edge: the canonical
    pose-graph test (mirrors a loop closure on KITTI-style sequences)."""
    rng = np.random.RandomState(seed)
    # ground truth: poses on a circle
    gt = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        q = lie.so3_exp(jnp.asarray([0.0, ang, 0.0]))
        t = jnp.asarray([np.cos(ang) * 3, 0.0, np.sin(ang) * 3], jnp.float32)
        gt.append(lie.sim3_from_se3(lie.se3(q, t)))
    gt = jnp.stack(gt)

    # odometry measurements from GT (perfect), estimates with drift
    est = [gt[0]]
    edges_i, edges_j, meas = [], [], []
    for i in range(n - 1):
        S_meas = lie.sim3_compose(gt[i + 1], lie.sim3_inverse(gt[i]))  # j*i^-1
        edges_i.append(i)
        edges_j.append(i + 1)
        meas.append(S_meas)
        noise = jnp.asarray(np.concatenate([rng.randn(3) * drift,
                                            rng.randn(3) * drift * 0.5,
                                            [0.0 if fix_scale else
                                             rng.randn() * drift * 0.3]]),
                            jnp.float32)
        S_odo = lie.sim3_compose(lie.sim3_exp(noise), S_meas)
        est.append(lie.sim3_compose(S_odo, est[-1]))
    # loop edge n-1 -> 0
    S_loop = lie.sim3_compose(gt[0], lie.sim3_inverse(gt[n - 1]))
    edges_i.append(n - 1)
    edges_j.append(0)
    meas.append(S_loop)

    prob = posegraph.PoseGraphProblem(
        nodes=jnp.stack(est),
        node_valid=jnp.ones(n, bool),
        node_fixed=jnp.zeros(n, bool).at[0].set(True),
        edge_i=jnp.asarray(edges_i, jnp.int32),
        edge_j=jnp.asarray(edges_j, jnp.int32),
        edge_meas=jnp.stack(meas),
        edge_w=jnp.ones(len(edges_i)),
        fix_scale=jnp.asarray(fix_scale))
    return prob, gt


def _err(nodes, gt):
    d = jax.vmap(lambda a, b: lie.sim3_compose(a, lie.sim3_inverse(b)))(nodes, gt)
    return float(jnp.max(jnp.linalg.norm(d[:, 4:7], axis=-1)))


def test_pose_graph_closes_loop():
    prob, gt = _ring_problem()
    err0 = _err(prob.nodes, gt)
    nodes, costs = jax.jit(lambda p: posegraph.optimize_pose_graph(p))(prob)
    err1 = _err(nodes, gt)
    assert err1 < 0.15 * err0, f"drift {err0} -> {err1}"
    # scales recovered ~1
    np.testing.assert_allclose(np.asarray(nodes[:, 7]), 1.0, atol=0.05)


def test_pose_graph_fix_scale():
    prob, gt = _ring_problem(fix_scale=True)
    nodes, _ = jax.jit(lambda p: posegraph.optimize_pose_graph(p))(prob)
    np.testing.assert_allclose(np.asarray(nodes[:, 7]), 1.0, atol=1e-5)
    assert _err(nodes, gt) < 0.3


def test_pose_graph_respects_fixed_node():
    prob, gt = _ring_problem()
    nodes, _ = jax.jit(lambda p: posegraph.optimize_pose_graph(p))(prob)
    np.testing.assert_allclose(np.asarray(nodes[0]), np.asarray(prob.nodes[0]),
                               atol=1e-6)


def test_pose_graph_inactive_edges():
    prob, gt = _ring_problem()
    # deactivating the loop edge leaves drift uncorrected at the ring end
    w = np.asarray(prob.edge_w).copy()
    w[-1] = 0.0
    prob2 = prob._replace(edge_w=jnp.asarray(w))
    nodes2, _ = jax.jit(lambda p: posegraph.optimize_pose_graph(p))(prob2)
    nodes1, _ = jax.jit(lambda p: posegraph.optimize_pose_graph(p))(prob)
    assert _err(nodes1, gt) < _err(nodes2, gt) + 1e-6

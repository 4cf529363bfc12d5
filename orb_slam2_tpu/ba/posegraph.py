"""Sim3 essential-graph optimization (loop-closure pose graph).

Replaces `Optimizer::OptimizeEssentialGraph` (Optimizer.cc:781-1044, g2o
BlockSolver_7_3 + VertexSim3Expmap/EdgeSim3): nodes are per-keyframe Sim3
poses, edges are spanning-tree + loop + strong-covisibility relative-Sim3
measurements, the residual is log(S_meas * S_i * S_j^-1) with identity
information (Optimizer.cc:849), and the normal equations are solved
matrix-free with CG over fixed-shape edge arrays — edge Jacobians come from
forward-mode autodiff on the retraction, vmapped over all edges at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.core import lie


class PoseGraphProblem(NamedTuple):
    nodes: jnp.ndarray      # [K, 8] Sim3 world->cam
    node_valid: jnp.ndarray  # [K]
    node_fixed: jnp.ndarray  # [K] (loop KF fixed, Optimizer.cc:834)
    edge_i: jnp.ndarray     # [E] i32
    edge_j: jnp.ndarray     # [E] i32
    edge_meas: jnp.ndarray  # [E, 8] S_ji measurement (maps cam_i -> cam_j... stored as S_j * S_i^-1)
    edge_w: jnp.ndarray     # [E] weight (0 = inactive)
    fix_scale: jnp.ndarray  # bool scalar — SE3 gauge for stereo/RGB-D


def edge_residual(S_i, S_j, S_meas):
    """r = log(S_meas * S_i * S_j^-1)  [7]; zero when S_meas = S_j S_i^-1."""
    rel = lie.sim3_compose(S_i, lie.sim3_inverse(S_j))
    return lie.sim3_log(lie.sim3_compose(S_meas, rel))


def optimize_pose_graph(prob: PoseGraphProblem, n_outer: int = 20,
                        n_cg: int = 40, lam0: float = 1e-6,
                        psum_axis: str | None = None):
    """Gauss-Newton/LM with CG; returns optimized nodes [K, 8].

    With `psum_axis`, the edge arrays are assumed sharded over that mesh
    axis (see distributed/posegraph.py): every cross-edge reduction is
    all-reduced so each device steps identical replicated nodes."""
    Kn = prob.nodes.shape[0]
    var = prob.node_valid & ~prob.node_fixed

    def maybe_psum(x):
        return jax.lax.psum(x, psum_axis) if psum_axis else x

    def residuals_and_jac(nodes):
        Si = nodes[prob.edge_i]
        Sj = nodes[prob.edge_j]

        def f(xi_i, xi_j, S_i, S_j, S_m):
            return edge_residual(lie.sim3_retract(S_i, xi_i),
                                 lie.sim3_retract(S_j, xi_j), S_m)

        z = jnp.zeros((prob.edge_i.shape[0], 7))
        r = jax.vmap(f)(z, z, Si, Sj, prob.edge_meas)           # [E, 7]
        Ji = jax.vmap(jax.jacfwd(f, argnums=0))(z, z, Si, Sj, prob.edge_meas)
        Jj = jax.vmap(jax.jacfwd(f, argnums=1))(z, z, Si, Sj, prob.edge_meas)
        if True:
            # fixed-scale gauge: project out the scale tangent coordinate
            mask7 = jnp.concatenate([jnp.ones(6), jnp.where(prob.fix_scale, 0.0, 1.0)[None]])
            Ji = Ji * mask7[None, None, :]
            Jj = Jj * mask7[None, None, :]
        return r, Ji, Jj

    def seg(vals, idx):
        return jax.ops.segment_sum(vals, idx, num_segments=Kn)

    def seg2(vi, vj):
        return maybe_psum(seg(vi, prob.edge_i) + seg(vj, prob.edge_j))

    def lm_step(carry, _):
        nodes, lam = carry
        r, Ji, Jj = residuals_and_jac(nodes)
        w = prob.edge_w
        # gradient
        g = seg2(jnp.einsum('eri,er,e->ei', Ji, r, w),
                 jnp.einsum('eri,er,e->ei', Jj, r, w))               # [K, 7]
        g = jnp.where(var[:, None], g, 0.0)
        # diag blocks for preconditioner
        Hii = seg2(jnp.einsum('eri,erj,e->eij', Ji, Ji, w),
                   jnp.einsum('eri,erj,e->eij', Jj, Jj, w))
        Hii = Hii + (lam + 1e-8) * jnp.eye(7)
        Pinv = jnp.linalg.inv(Hii)
        Pinv = jnp.where(var[:, None, None], Pinv, 0.0)

        def matvec(x):
            x = jnp.where(var[:, None], x, 0.0)
            vi = jnp.einsum('erj,ej->er', Ji, x[prob.edge_i])
            vj = jnp.einsum('erj,ej->er', Jj, x[prob.edge_j])
            v = (vi + vj) * w[:, None]
            out = seg2(jnp.einsum('eri,er->ei', Ji, v),
                       jnp.einsum('eri,er->ei', Jj, v))
            out = out + lam * x
            return jnp.where(var[:, None], out, 0.0)

        b = -g
        x = jnp.zeros_like(b)
        rr = b
        zz = jnp.einsum('kij,kj->ki', Pinv, rr)
        p = zz
        rz = jnp.sum(rr * zz)

        def cg(i, st):
            x, rr, zz, p, rz = st
            Ap = matvec(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Ap
            zz = jnp.einsum('kij,kj->ki', Pinv, rr)
            rz_new = jnp.sum(rr * zz)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            return (x, rr, zz, zz + beta * p, rz_new)

        dx = jax.lax.fori_loop(0, n_cg, cg, (x, rr, zz, p, rz))[0]
        dx = jnp.where(prob.fix_scale, dx.at[:, 6].set(0.0), dx)
        new_nodes = jax.vmap(lie.sim3_retract)(nodes, dx)
        new_nodes = jnp.where(var[:, None], new_nodes, nodes)

        cost_old = maybe_psum(jnp.sum(jnp.sum(r * r, -1) * w))
        r_new, _, _ = residuals_and_jac(new_nodes)
        cost_new = maybe_psum(jnp.sum(jnp.sum(r_new * r_new, -1) * w))
        ok = (cost_new < cost_old) & jnp.all(jnp.isfinite(new_nodes))
        nodes = jnp.where(ok, new_nodes, nodes)
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 8.0), 1e-12, 1e6)
        return (nodes, lam), cost_new

    (nodes, _), costs = jax.lax.scan(lm_step, (prob.nodes, jnp.float32(lam0)),
                                     None, length=n_outer)
    return nodes, costs

"""Distributed Sim3 essential-graph optimization over a device mesh.

Edges of the pose graph are sharded across the mesh's `edge` axis; node
states stay replicated and every cross-edge reduction in the CG-LM solver
becomes a `psum` over ICI (SURVEY.md §2.5: "sharded pose-graph relaxation").
Each device ends every LM step with identical replicated nodes — SPMD, no
coordinator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from orb_slam2_tpu.ba.posegraph import (PoseGraphProblem,
                                        optimize_pose_graph)


def make_edge_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), ("edge",), devices=devs[:n])


def pad_edges(prob: PoseGraphProblem, n_shards: int) -> PoseGraphProblem:
    """Pad edge arrays so E divides n_shards (padding edges have weight 0)."""
    E = prob.edge_i.shape[0]
    pad = (-E) % n_shards
    if pad == 0:
        return prob
    z = lambda x, fill: jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
    ident = jnp.zeros((pad, 8)).at[:, 0].set(1.0).at[:, 7].set(1.0)
    return prob._replace(
        edge_i=z(prob.edge_i, 0), edge_j=z(prob.edge_j, 0),
        edge_meas=jnp.concatenate([prob.edge_meas, ident]),
        edge_w=z(prob.edge_w, 0.0))


def distributed_pose_graph(prob: PoseGraphProblem, mesh: Mesh,
                           n_outer: int = 20, n_cg: int = 40):
    """Run optimize_pose_graph SPMD with edges sharded over `edge`."""
    n = mesh.shape["edge"]
    prob = pad_edges(prob, n)
    e = P("edge")
    rep = P()
    in_specs = PoseGraphProblem(
        nodes=rep, node_valid=rep, node_fixed=rep,
        edge_i=e, edge_j=e, edge_meas=e, edge_w=e, fix_scale=rep)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(in_specs,),
                       out_specs=(rep, rep), check_vma=False)
    def run(p: PoseGraphProblem):
        return optimize_pose_graph(p, n_outer=n_outer, n_cg=n_cg,
                                   psum_axis="edge")

    return jax.jit(run)(prob)

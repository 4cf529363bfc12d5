"""Distributed bundle adjustment over a device mesh.

The reference has no distributed story (single process, std::thread —
SURVEY.md §2.5); this module provides the TPU-native scaling path promised in
BASELINE.json: observations are sharded across devices on an `obs` mesh axis,
cameras/landmarks stay replicated, and every cross-observation reduction in
the Schur solver (camera/landmark segment-sums, CG matvec partial products)
becomes a `psum` over ICI.  Because each LM iteration's reductions are
all-reduced, every device ends each step with identical replicated states —
deterministic SPMD, no parameter server.

This is data-parallelism over the *observation* dimension, the dominant one
(R = K x N observations vs C cameras, M landmarks).  The same `shard_map`
pattern extends to a 2-D mesh with a landmark axis for maps that outgrow one
chip's HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam2_tpu.ba.schur import BAProblem, BAResult, ba_solve


def make_obs_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), ("obs",), devices=devs[:n])


def pad_problem(prob: BAProblem, n_shards: int) -> BAProblem:
    """Pad the observation arrays so R divides n_shards (padding rows have
    zero weight and scatter into camera slot 0 / point 0 harmlessly)."""
    R = prob.obs_cam.shape[0]
    pad = (-R) % n_shards
    if pad == 0:
        return prob
    z = lambda x, fill: jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
    return prob._replace(
        obs_cam=z(prob.obs_cam, 0), obs_pid=z(prob.obs_pid, 0),
        obs_uv=z(prob.obs_uv, 0.0), obs_ur=z(prob.obs_ur, -1.0),
        obs_w=z(prob.obs_w, 0.0))


def distributed_ba_solve(prob: BAProblem, mesh: Mesh, n_outer: int = 10,
                         n_cg: int = 30, **kw) -> BAResult:
    """Run `ba_solve` SPMD over the mesh's `obs` axis."""
    n = mesh.shape["obs"]
    prob = pad_problem(prob, n)

    obs_spec = P("obs")
    rep = P()
    in_specs = BAProblem(
        cam_pose=rep, cam_var=rep, points=rep, pt_var=rep,
        obs_cam=obs_spec, obs_pid=obs_spec, obs_uv=obs_spec,
        obs_ur=obs_spec, obs_w=obs_spec, K=rep, bf=rep)
    out_specs = BAResult(cam_pose=rep, points=rep, chi2=obs_spec,
                         inlier=obs_spec, lam=rep)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(in_specs,), out_specs=out_specs,
                       check_vma=False)
    def run(p: BAProblem) -> BAResult:
        return ba_solve(p, n_outer=n_outer, n_cg=n_cg, psum_axis="obs", **kw)

    return jax.jit(run)(prob)


# ---------------------------------------------------------------------------
# v2: landmark-sharded (map-block partitioned) distributed BA
# ---------------------------------------------------------------------------

def make_pt_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), ("pt",), devices=devs[:n])


def pad_point_major(prob: BAProblem, D: int, n_shards: int) -> BAProblem:
    """Pad a point-major problem (R = M*D rows, rows [p*D..p*D+D) belong to
    point p) so M divides n_shards; padding points are invalid, their rows
    weight 0."""
    M = prob.points.shape[0]
    assert prob.obs_w.shape[0] == M * D, (prob.obs_w.shape, M, D)
    pad = (-M) % n_shards
    if pad == 0:
        return prob
    zp = lambda x, fill: jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
    zr = lambda x, fill: jnp.concatenate(
        [x, jnp.full((pad * D,) + x.shape[1:], fill, x.dtype)])
    return prob._replace(
        points=zp(prob.points, 0.0), pt_var=zp(prob.pt_var, False),
        obs_cam=zr(prob.obs_cam, 0), obs_pid=zr(prob.obs_pid, 0),
        obs_uv=zr(prob.obs_uv, 0.0), obs_ur=zr(prob.obs_ur, -1.0),
        obs_w=zr(prob.obs_w, 0.0))


def distributed_ba_solve_sharded(prob: BAProblem, mesh: Mesh, D: int,
                                 n_outer: int = 10, n_cg: int = 30,
                                 **kw) -> BAResult:
    """Map-block-partitioned SPMD BA (SURVEY.md §2.5, BASELINE north star):
    landmarks AND their observation rows are sharded over the `pt` mesh axis
    (owner-computed: every row of a point lives with the point), cameras are
    replicated.  Point-side work — Hpp/bp assembly, the damped 3x3 inverses
    of the Schur marginalization, landmark back-substitution, the landmark
    stage of every CG matvec — runs purely device-local on each shard's map
    block; only the reduced camera system (Hcc/bc/S-products, O(C) not O(M))
    and the scalar LM costs cross the interconnect via psum.

    Unlike v1 (`distributed_ba_solve`, observation-sharded with replicated
    landmarks) this scales to maps that do not fit one device: per-device
    landmark memory is O(M / n_devices).

    `prob` must be point-major (from
    `ba/local.py:build_global_problem_point_major`): R = M*D with rows
    [p*D, (p+1)*D) owned by point p.
    """
    n = mesh.shape["pt"]
    prob = pad_point_major(prob, D, n)
    M = prob.points.shape[0]
    M_loc = M // n

    sh = P("pt")
    rep = P()
    in_specs = BAProblem(
        cam_pose=rep, cam_var=rep, points=sh, pt_var=sh,
        obs_cam=sh, obs_pid=sh, obs_uv=sh, obs_ur=sh, obs_w=sh,
        K=rep, bf=rep)
    out_specs = BAResult(cam_pose=rep, points=sh, chi2=sh, inlier=sh,
                         lam=rep)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(in_specs,),
                       out_specs=out_specs, check_vma=False)
    def run(p: BAProblem) -> BAResult:
        # remap global point ids to shard-local slot indices: rows are
        # point-major, so the local layout is simply repeat(arange(M_loc), D)
        local_pid = jnp.repeat(
            jnp.arange(M_loc, dtype=p.obs_pid.dtype), D)
        p = p._replace(obs_pid=local_pid)
        return ba_solve(p, n_outer=n_outer, n_cg=n_cg, psum_axis="pt",
                        pt_owner_complete=True, **kw)

    return jax.jit(run)(prob)

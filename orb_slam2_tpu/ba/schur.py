"""Bundle adjustment: Levenberg-Marquardt with Schur-complement landmark
marginalization, solved matrix-free with preconditioned conjugate gradient.

Replaces g2o's BlockSolver_6_3 + LinearSolverEigen + LM pipeline (reference
Optimizer.cc:49-237 and 453-778, Thirdparty/g2o block_solver.h:132-172).
Where g2o builds and factorizes the sparse reduced camera system, the TPU
formulation never materializes it: the Schur product

    S x = (Hcc + lam D) x  -  W Hpp^-1 W^T x

is evaluated per-observation with gathers + segment-sums (all fixed-shape,
VPU/MXU friendly), and CG with a block-Jacobi preconditioner solves the
camera system.  Landmark updates are recovered by batched damped 3x3
inverses.  This is also the unit that shards over a device mesh: observations
are partitioned across devices and every segment-sum/matvec gains a psum
(see distributed/).

Observation layout (R = rows, fixed capacity):
    obs_cam [R] i32   index into the local camera array
    obs_pid [R] i32   global map-point id
    obs_uv  [R, 2]    measured pixel coords
    obs_ur  [R]       stereo right-u (-1 => mono)
    obs_w   [R]       information weight (inv sigma^2), 0 => inactive
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.core import lie


class BAProblem(NamedTuple):
    cam_pose: jnp.ndarray   # [C, 7] SE3 Tcw
    cam_var: jnp.ndarray    # [C] bool — optimize this camera?
    points: jnp.ndarray     # [M, 3]
    pt_var: jnp.ndarray     # [M] bool — optimize this point?
    obs_cam: jnp.ndarray    # [R]
    obs_pid: jnp.ndarray    # [R]
    obs_uv: jnp.ndarray     # [R, 2]
    obs_ur: jnp.ndarray     # [R]
    obs_w: jnp.ndarray      # [R]
    K: jnp.ndarray          # [4] intrinsics
    bf: jnp.ndarray         # scalar


class BAResult(NamedTuple):
    cam_pose: jnp.ndarray
    points: jnp.ndarray
    chi2: jnp.ndarray       # [R] final per-obs chi2 (robust-unweighted)
    inlier: jnp.ndarray     # [R] final chi2 <= threshold mask
    lam: jnp.ndarray = jnp.float32(0.0)  # final LM damping (chunked resume)


def _residuals(prob: BAProblem, cam_pose, points):
    """e [R, 3], Jc [R, 3, 6], Jp [R, 3, 3] for all observations."""
    T = cam_pose[prob.obs_cam]
    pw = points[prob.obs_pid]
    q = T[:, :4]
    pc = lie.quat_rotate(q, pw) + T[:, 4:7]
    x, y = pc[:, 0], pc[:, 1]
    z = jnp.maximum(pc[:, 2], 1e-6)
    fx, fy, cx, cy = prob.K[0], prob.K[1], prob.K[2], prob.K[3]
    u = fx * x / z + cx
    v = fy * y / z + cy
    is_st = prob.obs_ur >= 0
    ur = u - prob.bf / z
    e = jnp.stack([prob.obs_uv[:, 0] - u, prob.obs_uv[:, 1] - v,
                   jnp.where(is_st, prob.obs_ur - ur, 0.0)], -1)
    iz = 1.0 / z
    iz2 = iz * iz
    zeros = jnp.zeros_like(z)
    du = jnp.stack([fx * iz, zeros, -fx * x * iz2], -1)
    dv = jnp.stack([zeros, fy * iz, -fy * y * iz2], -1)
    dur = du + jnp.stack([zeros, zeros, prob.bf * iz2], -1)
    dproj = jnp.stack([du, dv, jnp.where(is_st[:, None], dur, 0.0)], 1)  # [R,3,3]
    I = jnp.broadcast_to(jnp.eye(3), (e.shape[0], 3, 3))
    dpc_dxi = jnp.concatenate([I, -lie.hat(pc)], -1)   # [R, 3, 6]
    Jc = -jnp.einsum('rij,rjk->rik', dproj, dpc_dxi)
    Rw = lie.quat_to_matrix(q)                          # dpc/dpw = R
    Jp = -jnp.einsum('rij,rjk->rik', dproj, Rw)
    return e, Jc, Jp


def _inv3x3(A):
    """Batched closed-form 3x3 inverse via adjugate."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A12 + c * A13
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    adj = jnp.stack([A11, A12, A13, A21, A22, A23, A31, A32, A33], -1)
    return adj.reshape(A.shape) * inv_det[..., None, None]


def _huber_w(chi2, delta2):
    return jnp.where(chi2 <= delta2, 1.0,
                     jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


def _chol3x3(A):
    """Batched closed-form Cholesky of (PSD) 3x3 blocks; zero blocks -> 0."""
    eps = 1e-12
    a11 = jnp.maximum(A[..., 0, 0], 0.0)
    l11 = jnp.sqrt(a11 + eps)
    l21 = A[..., 1, 0] / l11
    l22 = jnp.sqrt(jnp.maximum(A[..., 1, 1] - l21 * l21, 0.0) + eps)
    l31 = A[..., 2, 0] / l11
    l32 = (A[..., 2, 1] - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(A[..., 2, 2] - l31 * l31 - l32 * l32, 0.0) + eps)
    z = jnp.zeros_like(l11)
    L = jnp.stack([
        jnp.stack([l11, z, z], -1),
        jnp.stack([l21, l22, z], -1),
        jnp.stack([l31, l32, l33], -1)], -2)
    # zero-out blocks that were all-zero (inactive points)
    nz = jnp.abs(A).sum((-1, -2)) > 1e-10
    return jnp.where(nz[..., None, None], L, 0.0)


# relative robust-cost improvement below which the dense LM stops early
DENSE_STOP_TOL = 1e-3


def ba_solve_dense(prob: BAProblem, pt_obs_r: jnp.ndarray, n_per_cam: int,
                   n_outer: int = 10, huber_delta2: float = 5.991,
                   use_huber: bool = True, lam0: float = 1e-4,
                   chi2_th_mono: float = 5.991, chi2_th_stereo: float = 7.815,
                   chunk: int = 2048,
                   psum_axis: str | None = None) -> BAResult:
    """LM with an explicitly materialized Schur reduced camera system.

    The TPU-native replacement of g2o's BlockSolver Schur path
    (block_solver.h:132-172): instead of CG on a matrix-free operator (slow:
    hundreds of latency-bound small kernels), the [6C, 6C] reduced system

        S = Hcc + lam I  -  sum_p W_p (Hpp_p + lam I)^-1 W_p^T

    is built with gathers + one-hot einsums + an MXU matmul (G^T G with
    G[p3, c6] = per-point whitened camera Jacobian blocks), then solved
    directly.  Every LM iteration performs an *exact* Gauss-Newton/LM step,
    so far fewer iterations are needed than with inexact CG.

    Requirements on the problem layout (both producers in ba/local.py obey):
      * observations are camera-major: obs_cam == repeat(arange(C), N),
        with `n_per_cam` == N (enables reshape-based camera reductions —
        zero scatters in the whole solve);
      * `pt_obs_r` [P, D] gives, per point slot, the observation row indices
        of its observers (-1 = none) — the transpose index built from the
        map's `mp_obs_kf/kp` mirror;
      * `prob.obs_w` is nonzero only for observations present in `pt_obs_r`
        (point-side and camera-side reductions must see the same set).

    With `psum_axis`, observation rows are sharded over that mesh axis:
    Hcc/bc/S/rhs become partial sums that are psum-reduced before the solve
    (the point side must be replicated or owner-complete per shard).
    """
    C = prob.cam_pose.shape[0]
    P = prob.points.shape[0]
    R = prob.obs_w.shape[0]
    D = pt_obs_r.shape[1]
    assert P % chunk == 0 or P < chunk, (P, chunk)
    delta2 = jnp.where(prob.obs_ur >= 0,
                       huber_delta2 * chi2_th_stereo / chi2_th_mono,
                       huber_delta2)

    act_pd = pt_obs_r >= 0                      # [P, D]
    rs = jnp.clip(pt_obs_r, 0, None)
    obs_cam_pd = jnp.where(act_pd, prob.obs_cam[rs], C)  # C = "no cam"
    n_chunks = max(P // chunk, 1)
    cam_ids = jnp.arange(C)

    def maybe_psum(x):
        return jax.lax.psum(x, psum_axis) if psum_axis else x

    def seg_cam(vals):
        """[R, ...] -> [C, ...] camera-major reshape reduction."""
        out = vals.reshape((C, n_per_cam) + vals.shape[1:]).sum(1)
        return maybe_psum(out)

    def seg_pt(vals):
        """[R, ...] -> [P, ...] via the mirror transpose (gather + sum)."""
        g = jnp.where(act_pd.reshape(act_pd.shape + (1,) * (vals.ndim - 1)),
                      vals[rs], 0.0)
        return g.sum(1)

    def chi2_fn(cam_pose, points):
        e, _, _ = _residuals(prob, cam_pose, points)
        return jnp.sum(e * e, -1) * prob.obs_w

    def lm_step(carry, _):
        cam_pose, points, lam = carry
        e, Jc, Jp = _residuals(prob, cam_pose, points)
        chi2 = jnp.sum(e * e, -1) * prob.obs_w
        w_rob = _huber_w(chi2, delta2) if use_huber else jnp.ones_like(chi2)
        w = prob.obs_w * w_rob                                   # [R]

        Hcc = seg_cam(jnp.einsum('rij,rik,r->rjk', Jc, Jc, w))   # [C, 6, 6]
        bc = seg_cam(jnp.einsum('rij,ri,r->rj', Jc, e, w))       # [C, 6]
        Hpp_r = jnp.einsum('rij,rik,r->rjk', Jp, Jp, w)          # [R, 3, 3]
        bp_r = jnp.einsum('rij,ri,r->rj', Jp, e, w)
        Hpp = seg_pt(Hpp_r)                                      # [P, 3, 3]
        bp = seg_pt(bp_r)                                        # [P, 3]
        U = jnp.einsum('rij,rik,r->rjk', Jc, Jp, w)              # [R, 6, 3]

        Hpp_inv = _inv3x3(Hpp + lam * jnp.eye(3))
        Hpp_inv = jnp.where(prob.pt_var[:, None, None], Hpp_inv, 0.0)
        L = _chol3x3(Hpp_inv)                                    # [P, 3, 3]

        # whitened per-obs camera blocks Z = U L  -> [P, D, 6, 3]
        Z = jnp.einsum('rjk,rkl->rjl', U, L[prob.obs_pid])
        Z_pd = jnp.where(act_pd[..., None, None], Z[rs], 0.0)

        # S_corr = G^T G accumulated over point chunks
        def chunk_body(i, S):
            sl = jax.lax.dynamic_slice_in_dim
            oc = sl(obs_cam_pd, i * chunk, min(chunk, P), 0)     # [Pc, D]
            zz = sl(Z_pd, i * chunk, min(chunk, P), 0)           # [Pc, D, 6, 3]
            onehot = (oc[..., None] == cam_ids).astype(jnp.float32)
            G = jnp.einsum('pdc,pdjl->plcj', onehot, zz)         # [Pc,3,C,6]
            Gm = G.reshape(-1, C * 6)
            return S + Gm.T @ Gm

        S_corr = jax.lax.fori_loop(
            0, n_chunks, chunk_body, jnp.zeros((C * 6, C * 6), jnp.float32))

        # rhs = bc - W Hpp^-1 bp (camera side)
        y = jnp.einsum('pkl,pl->pk', Hpp_inv, bp)                # [P, 3]
        yb = jnp.einsum('rjk,rk->rj', U, y[prob.obs_pid])        # [R, 6]
        rhs = bc - seg_cam(yb)
        rhs = jnp.where(prob.cam_var[:, None], rhs, 0.0)

        S_corr = maybe_psum(S_corr)
        Hcc_big = jnp.zeros((C, 6, C, 6), jnp.float32)
        Hcc_big = Hcc_big.at[cam_ids, :, cam_ids, :].set(
            Hcc + lam * jnp.eye(6))
        S = Hcc_big.reshape(C * 6, C * 6) - S_corr
        # fixed cameras: identity rows/cols
        var6 = jnp.repeat(prob.cam_var, 6)
        S = jnp.where(var6[:, None] & var6[None, :], S, 0.0)
        S = S + jnp.diag(jnp.where(var6, 0.0, 1.0))
        dx = jnp.linalg.solve(S, -rhs.reshape(-1)).reshape(C, 6)
        dx = jnp.where(prob.cam_var[:, None], dx, 0.0)

        # back-substitute landmarks: dp = Hpp^-1 (-bp - W^T dx), gather-based
        xg = dx[obs_cam_pd.clip(0, C - 1)]                       # [P, D, 6]
        U_pd = jnp.where(act_pd[..., None, None], U[rs], 0.0)
        s = jnp.einsum('pdjl,pdj->pl', U_pd, xg)                 # [P, 3]
        dp = jnp.einsum('pkl,pl->pk', Hpp_inv, -bp - s)
        dp = jnp.where(prob.pt_var[:, None], dp, 0.0)

        new_cam = jax.vmap(lie.se3_retract)(cam_pose, dx)
        new_cam = jnp.where(prob.cam_var[:, None], new_cam, cam_pose)
        new_points = points + dp

        old_cost = jnp.sum(chi2 * w_rob)
        new_chi2 = chi2_fn(new_cam, new_points)
        new_rob = _huber_w(new_chi2, delta2) if use_huber else 1.0
        new_cost = maybe_psum(jnp.sum(new_chi2 * new_rob))
        old_cost = maybe_psum(old_cost)
        ok = (new_cost < old_cost) & jnp.all(jnp.isfinite(new_cam)) & \
            jnp.all(jnp.isfinite(new_points))
        cam_pose = jnp.where(ok, new_cam, cam_pose)
        points = jnp.where(ok, new_points, points)
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-9, 1e6)
        cost_after = jnp.where(ok, new_cost, old_cost)
        return (cam_pose, points, lam), (cost_after, ok)

    # early-stopping LM: each iteration is an EXACT step (direct solve), so
    # convergence is typically reached in far fewer than n_outer iterations;
    # stop once an accepted step improves the robust cost by < 0.1%
    # (the reference always runs its fixed 5+10 schedule, Optimizer.cc:659,
    # but pays ~0 per extra iteration on a CPU-sized problem — here every
    # extra exact iteration costs ~16 ms of device time)
    def cond_fn(st):
        _, _, _, i, _, done = st
        return (i < n_outer) & jnp.logical_not(done)

    def body_fn(st):
        cam_pose, points, lam, i, prev_cost, _ = st
        (cam_pose, points, lam), (cost_after, ok) = lm_step(
            (cam_pose, points, lam), None)
        rel = (prev_cost - cost_after) / jnp.maximum(prev_cost, 1e-9)
        done = ok & (i >= 2) & (rel < DENSE_STOP_TOL)
        return (cam_pose, points, lam, i + 1, cost_after, done)

    cam_pose, points, lam, _, _, _ = jax.lax.while_loop(
        cond_fn, body_fn,
        (prob.cam_pose, prob.points, jnp.asarray(lam0, jnp.float32),
         jnp.int32(0), jnp.float32(jnp.inf), jnp.asarray(False)))

    chi2 = chi2_fn(cam_pose, points)
    th = jnp.where(prob.obs_ur >= 0, chi2_th_stereo, chi2_th_mono)
    inlier = (chi2 <= th) & (prob.obs_w > 0)
    return BAResult(cam_pose=cam_pose, points=points, chi2=chi2,
                    inlier=inlier, lam=lam)


def ba_solve(prob: BAProblem, n_outer: int = 10, n_cg: int = 40,
             huber_delta2: float = 5.991, use_huber: bool = True,
             lam0: float = 1e-4, chi2_th_mono: float = 5.991,
             chi2_th_stereo: float = 7.815,
             psum_axis: str | None = None,
             pt_owner_complete: bool = False) -> BAResult:
    """Run LM for `n_outer` iterations.  If `psum_axis` is given, the
    observation arrays are assumed sharded over that mesh axis and all
    cross-observation reductions are all-reduced (distributed BA).

    With `pt_owner_complete=True` (landmark-sharded SPMD: every observation
    row of a point lives on the device that owns that point), the point-side
    reductions (Hpp/bp and the CG matvec's landmark stage) stay device-local
    — only camera-side reductions and LM costs are all-reduced.  This is the
    map-block partitioning of SURVEY.md §2.5: Schur landmark marginalization
    owner-computed per shard, reduced camera system assembled with psum."""
    C = prob.cam_pose.shape[0]
    M = prob.points.shape[0]
    # per-obs Huber delta^2: stereo edges get the 7.815 gate
    # (reference Optimizer.cc:118,155)
    delta2 = jnp.where(prob.obs_ur >= 0,
                       huber_delta2 * chi2_th_stereo / chi2_th_mono,
                       huber_delta2)

    def maybe_psum(x):
        return jax.lax.psum(x, psum_axis) if psum_axis else x

    def seg_cam(vals):
        """segment-sum over observations into camera slots."""
        out = jax.ops.segment_sum(vals, prob.obs_cam, num_segments=C)
        return maybe_psum(out)

    def seg_pt(vals):
        out = jax.ops.segment_sum(vals, prob.obs_pid, num_segments=M)
        return out if pt_owner_complete else maybe_psum(out)

    def chi2_fn(cam_pose, points):
        e, _, _ = _residuals(prob, cam_pose, points)
        return jnp.sum(e * e, -1) * prob.obs_w

    def lm_step(carry, _):
        cam_pose, points, lam = carry
        e, Jc, Jp = _residuals(prob, cam_pose, points)
        chi2 = jnp.sum(e * e, -1) * prob.obs_w
        w_rob = _huber_w(chi2, delta2) if use_huber else jnp.ones_like(chi2)
        w = prob.obs_w * w_rob                                # [R]

        # weighted blocks
        Hcc = seg_cam(jnp.einsum('rij,rik,r->rjk', Jc, Jc, w))   # [C, 6, 6]
        bc = seg_cam(jnp.einsum('rij,ri,r->rj', Jc, e, w))       # [C, 6]
        Hpp = seg_pt(jnp.einsum('rij,rik,r->rjk', Jp, Jp, w))    # [M, 3, 3]
        bp = seg_pt(jnp.einsum('rij,ri,r->rj', Jp, e, w))        # [M, 3]
        Wb = jnp.einsum('rij,rik,r->rjk', Jc, Jp, w)             # [R, 6, 3]

        lamI3 = lam * jnp.eye(3)
        Hpp_inv = _inv3x3(Hpp + lamI3)
        Hpp_inv = jnp.where(prob.pt_var[:, None, None], Hpp_inv, 0.0)

        # rhs of Schur system: bc - W Hpp^-1 bp
        yb = jnp.einsum('rjk,rk->rj', Wb, jnp.einsum(
            'mkl,ml->mk', Hpp_inv, bp)[prob.obs_pid])
        rhs = bc - seg_cam(yb)
        rhs = jnp.where(prob.cam_var[:, None], rhs, 0.0)

        Hcc_d = Hcc + lam * jnp.eye(6)

        def schur_mv(x):
            """x [C, 6] -> S x."""
            x = jnp.where(prob.cam_var[:, None], x, 0.0)
            hx = jnp.einsum('cij,cj->ci', Hcc_d, x)
            u = jnp.einsum('rjk,rj->rk', Wb, x[prob.obs_cam])     # [R, 3]
            s = seg_pt(u)                                         # [M, 3]
            s = jnp.einsum('mkl,ml->mk', Hpp_inv, s)
            t = jnp.einsum('rjk,rk->rj', Wb, s[prob.obs_pid])     # [R, 6]
            out = hx - seg_cam(t)
            return jnp.where(prob.cam_var[:, None], out, 0.0)

        # block-Jacobi preconditioner from damped Hcc
        Pinv = jnp.linalg.inv(Hcc_d + jnp.eye(6) * 1e-8)
        Pinv = jnp.where(prob.cam_var[:, None, None], Pinv, 0.0)

        def precond(r):
            return jnp.einsum('cij,cj->ci', Pinv, r)

        # PCG (solves S dx = rhs; note GN step with e = obs-pred, J = de/dx
        # means normal equations are S dx = -rhs... sign handled here)
        b = -rhs
        x0 = jnp.zeros_like(b)
        r0 = b
        z0 = precond(r0)
        p0 = z0

        def cg_body(i, st):
            x, r, z, p, rz = st
            Ap = schur_mv(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) > 1e-20, pAp, 1e-20)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
            p = z + beta * p
            return (x, r, z, p, rz_new)

        dx_cam = jax.lax.fori_loop(
            0, n_cg, cg_body, (x0, r0, z0, p0, jnp.sum(r0 * z0)))[0]

        # back-substitute landmarks: dp = Hpp^-1 (-bp - W^T dx)
        wx = jnp.einsum('rjk,rj->rk', Wb, dx_cam[prob.obs_cam])   # [R, 3]
        swx = seg_pt(wx)
        dp = jnp.einsum('mkl,ml->mk', Hpp_inv, -bp - swx)
        dp = jnp.where(prob.pt_var[:, None], dp, 0.0)

        new_cam = jax.vmap(lie.se3_retract)(cam_pose, dx_cam)
        new_cam = jnp.where(prob.cam_var[:, None], new_cam, cam_pose)
        new_points = points + dp

        # LM accept/reject must be a GLOBAL decision under sharding: psum the
        # costs so every device takes the same branch (divergent `ok` would
        # silently fork the replicated camera states across devices)
        old_cost = maybe_psum(jnp.sum(chi2 * w_rob))
        new_chi2 = chi2_fn(new_cam, new_points)
        new_rob = _huber_w(new_chi2, delta2) if use_huber else 1.0
        new_cost = maybe_psum(jnp.sum(new_chi2 * new_rob))
        ok = (new_cost < old_cost) & jnp.all(jnp.isfinite(new_cam)) & \
            jnp.all(jnp.isfinite(new_points))
        if psum_axis and not pt_owner_complete:
            pass  # points replicated: finiteness check already global
        elif psum_axis:
            # landmark-sharded: a non-finite point on any shard must veto
            ok = jax.lax.pmin(ok.astype(jnp.int32), psum_axis) > 0
        cam_pose = jnp.where(ok, new_cam, cam_pose)
        points = jnp.where(ok, new_points, points)
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-9, 1e6)
        return (cam_pose, points, lam), new_cost

    (cam_pose, points, lam), _ = jax.lax.scan(
        lm_step, (prob.cam_pose, prob.points,
                  jnp.asarray(lam0, jnp.float32)),
        None, length=n_outer)

    chi2 = chi2_fn(cam_pose, points)
    th = jnp.where(prob.obs_ur >= 0, chi2_th_stereo, chi2_th_mono)
    inlier = (chi2 <= th) & (prob.obs_w > 0)
    return BAResult(cam_pose=cam_pose, points=points, chi2=chi2,
                    inlier=inlier, lam=lam)

"""EPnP + RANSAC absolute pose from 3D-2D correspondences.

Replaces `PnPsolver` (PnPsolver.cc, the modified Lepetit EPnP): 4 control
points from PCA, barycentric coordinates, the 12x12 M^T M eigen-system, the
beta-scaled null-vector solution with Gauss-Newton refinement on the
control-point distance constraints, and Horn alignment for (R, t) — all
batched over RANSAC samples with vmap instead of the reference's scalar
iterate loop (PnPsolver.cc:154-338).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.solvers.sim3 import horn_sim3


class PnPResult(NamedTuple):
    ok: jnp.ndarray
    T: jnp.ndarray          # [7] Tcw
    inliers: jnp.ndarray    # [N]
    n_inliers: jnp.ndarray


def _control_points(pw: jnp.ndarray):
    """[n, 3] -> world control points [4, 3] (centroid + PCA axes)."""
    c0 = jnp.mean(pw, axis=0)
    x = pw - c0
    cov = x.T @ x / pw.shape[0]
    w, v = jnp.linalg.eigh(cov)
    k = jnp.sqrt(jnp.maximum(w, 1e-9))
    cps = c0 + v.T * k[:, None]          # rows: c0 + sqrt(l_i) v_i
    return jnp.concatenate([c0[None], cps], axis=0)  # [4, 3]


def _barycentric(cw: jnp.ndarray, pw: jnp.ndarray):
    """alphas [n, 4] with pw = sum_j alpha_j cw_j, sum alpha = 1."""
    B = (cw[1:] - cw[0]).T               # [3, 3]
    Binv = jnp.linalg.inv(B + 1e-9 * jnp.eye(3))
    a123 = (pw - cw[0]) @ Binv.T         # [n, 3]
    a0 = 1.0 - jnp.sum(a123, axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)


def _dist2_pairs(c: jnp.ndarray):
    """Squared distances of the 6 control-point pairs [6]."""
    idx = jnp.asarray([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    d = c[idx[:, 0]] - c[idx[:, 1]]
    return jnp.sum(d * d, axis=-1)


def epnp_solve(pw: jnp.ndarray, uv: jnp.ndarray, K: jnp.ndarray,
               w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Single EPnP solve over all given correspondences -> Tcw [7].

    w: optional per-row weight (0 masks a row) — lets one fixed-shape solve
    serve masked RANSAC samples.
    """
    n = pw.shape[0]
    if w is None:
        w = jnp.ones((n,))
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    cw = _control_points(pw)
    alpha = _barycentric(cw, pw)          # [n, 4]

    u, v = uv[:, 0], uv[:, 1]
    # M rows (Lepetit eq. 5-6); weighted
    r1 = jnp.concatenate([alpha * fx, jnp.zeros((n, 4)),
                          alpha * (cx - u)[:, None]], axis=1)  # [n, 12]
    r2 = jnp.concatenate([jnp.zeros((n, 4)), alpha * fy,
                          alpha * (cy - v)[:, None]], axis=1)
    # interleave into control-point-major layout: columns are
    # [x1..x4, y1..y4, z1..z4]; reorder to [c1(xyz), c2(xyz), ...]
    perm = jnp.asarray([0, 4, 8, 1, 5, 9, 2, 6, 10, 3, 7, 11])
    M = jnp.concatenate([r1, r2], axis=0)[:, perm]            # [2n, 12]
    wm = jnp.concatenate([w, w])[:, None]
    MtM = (M * wm).T @ M
    eigw, eigv = jnp.linalg.eigh(MtM)
    V = eigv[:, :4].T.reshape(4, 4, 3)    # 4 smallest null-ish vectors

    dw2 = _dist2_pairs(cw)                # world control distances^2

    def beta_case1():
        v1 = V[0]
        dc2 = _dist2_pairs(v1)
        beta = jnp.sum(jnp.sqrt(dc2 * dw2)) / jnp.maximum(jnp.sum(dc2), 1e-12)
        return jnp.asarray([beta, 0.0, 0.0, 0.0])

    def beta_case2():
        # approx_betas for N=2 (PnPsolver compute_betas_approx_2):
        # solve L [b11, b12, b22] = rho in least squares
        idx = jnp.asarray([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
        dv1 = V[0][idx[:, 0]] - V[0][idx[:, 1]]
        dv2 = V[1][idx[:, 0]] - V[1][idx[:, 1]]
        L = jnp.stack([jnp.sum(dv1 * dv1, -1), 2 * jnp.sum(dv1 * dv2, -1),
                       jnp.sum(dv2 * dv2, -1)], axis=1)       # [6, 3]
        sol = jnp.linalg.lstsq(L, dw2)[0]
        b1 = jnp.sqrt(jnp.maximum(jnp.abs(sol[0]), 1e-12))
        b2 = jnp.sqrt(jnp.maximum(jnp.abs(sol[2]), 1e-12)) * jnp.sign(sol[1]) * jnp.sign(sol[0])
        return jnp.asarray([b1, b2, 0.0, 0.0])

    def beta_case3():
        # approx_betas for N=3 (PnPsolver compute_betas_approx_3,
        # PnPsolver.h:100-104): L [b11 b12 b22 b13 b23] = rho, 6x5 lstsq
        idx = jnp.asarray([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
        dv1 = V[0][idx[:, 0]] - V[0][idx[:, 1]]
        dv2 = V[1][idx[:, 0]] - V[1][idx[:, 1]]
        dv3 = V[2][idx[:, 0]] - V[2][idx[:, 1]]
        L = jnp.stack([jnp.sum(dv1 * dv1, -1), 2 * jnp.sum(dv1 * dv2, -1),
                       jnp.sum(dv2 * dv2, -1), 2 * jnp.sum(dv1 * dv3, -1),
                       2 * jnp.sum(dv2 * dv3, -1)], axis=1)   # [6, 5]
        x = jnp.linalg.lstsq(L, dw2)[0]
        b1 = jnp.sqrt(jnp.maximum(jnp.abs(x[0]), 1e-12))
        b2 = jnp.sqrt(jnp.maximum(jnp.abs(x[2]), 1e-12)) * jnp.sign(x[1]) * \
            jnp.sign(x[0])
        b3 = x[3] / jnp.maximum(b1, 1e-12)
        return jnp.asarray([b1, b2, b3, 0.0])

    def beta_case4():
        # approx_betas for N=4 (PnPsolver compute_betas_approx_1,
        # PnPsolver.h:94-98): L [b11 b12 b13 b14] = rho, 6x4 lstsq
        idx = jnp.asarray([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
        dvs = [V[k][idx[:, 0]] - V[k][idx[:, 1]] for k in range(4)]
        L = jnp.stack([jnp.sum(dvs[0] * dvs[0], -1),
                       2 * jnp.sum(dvs[0] * dvs[1], -1),
                       2 * jnp.sum(dvs[0] * dvs[2], -1),
                       2 * jnp.sum(dvs[0] * dvs[3], -1)], axis=1)  # [6, 4]
        x = jnp.linalg.lstsq(L, dw2)[0]
        b1 = jnp.sqrt(jnp.maximum(jnp.abs(x[0]), 1e-12)) * jnp.sign(x[0])
        b1 = jnp.where(b1 == 0, 1e-6, b1)
        return jnp.asarray([jnp.abs(b1), x[1] / b1, x[2] / b1, x[3] / b1])

    def gauss_newton(betas, iters=5):
        idx = jnp.asarray([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])

        def resid(b):
            cc = jnp.einsum('k,kij->ij', b, V)   # [4, 3]
            return _dist2_pairs(cc) - dw2

        def body(_, b):
            J = jax.jacfwd(resid)(b)             # [6, 4]
            r = resid(b)
            dx = jnp.linalg.lstsq(J, -r)[0]
            return b + dx

        return jax.lax.fori_loop(0, iters, body, betas)

    candidates = [gauss_newton(beta_case1()), gauss_newton(beta_case2()),
                  gauss_newton(beta_case3()), gauss_newton(beta_case4())]

    def recover(betas):
        cc = jnp.einsum('k,kij->ij', betas, V)   # camera control points [4,3]
        # depth sign: points must be in front
        pc = alpha @ cc
        sign = jnp.sign(jnp.sum(pc[:, 2] * w) + 1e-12)
        cc = cc * sign
        # rigid alignment cw -> cc (fix scale)
        S = horn_sim3(cc[None], cw[None], fix_scale=True)[0]
        T = S[:7]
        return T

    def reproj_cost(T):
        pr = camera.project(K, lie.se3_apply(T, pw))
        return jnp.sum(jnp.sum((pr - uv) ** 2, -1) * w)

    Ts = jnp.stack([recover(b) for b in candidates])
    costs = jnp.stack([reproj_cost(T) for T in Ts])
    return Ts[jnp.argmin(costs)]


def pnp_ransac(key, pw: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray,
               K: jnp.ndarray, max_err2: jnp.ndarray, iters: int = 128,
               sample_size: int = 6, min_inliers: int = 10) -> PnPResult:
    """Batched RANSAC EPnP (reference PnPsolver::iterate, PnPsolver.cc:154).

    max_err2: [N] per-point squared-pixel gate (th2 * sigma^2).
    """
    from orb_slam2_tpu.solvers.twoview import _sample_sets
    n = pw.shape[0]
    sets = _sample_sets(key, valid, iters, sample_size)   # [iters, k]

    def solve_one(idx):
        return epnp_solve(pw[idx], uv[idx], K)

    Ts = jax.vmap(solve_one)(sets)                        # [iters, 7]

    def count(T):
        pc = lie.se3_apply(T, pw)
        pr = camera.project(K, pc)
        err = jnp.sum((pr - uv) ** 2, -1)
        return valid & (err < max_err2) & (pc[:, 2] > 0)

    inl = jax.vmap(count)(Ts)
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    # refine on the best inlier set with a weighted full solve
    w = inl[best].astype(jnp.float32)
    T_ref = epnp_solve(pw, uv, K, w=w * valid)
    inl_ref = count(T_ref)
    better = jnp.sum(inl_ref) >= counts[best]
    T_fin = jnp.where(better, T_ref, Ts[best])
    inl_fin = jnp.where(better, inl_ref, inl[best])
    n_in = jnp.sum(inl_fin.astype(jnp.int32))
    return PnPResult(ok=n_in >= min_inliers, T=T_fin, inliers=inl_fin,
                     n_inliers=n_in)

"""Sim3/SE3 estimation between two keyframes from matched map points.

Replaces `Sim3Solver` (Sim3Solver.cc): Horn's closed-form quaternion
absolute-orientation on 3-point samples, RANSAC over all hypotheses at once,
two-way reprojection inlier check (Sim3Solver.cc:166-224); and
`Optimizer::OptimizeSim3` (Optimizer.cc:1046-1241): LM refinement of the
relative Sim3 with paired forward/inverse projection residuals.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.core import camera, lie


class Sim3Result(NamedTuple):
    ok: jnp.ndarray
    S12: jnp.ndarray        # [8] Sim3 mapping cam2 coords into cam1
    inliers: jnp.ndarray    # [N]
    n_inliers: jnp.ndarray


def horn_sim3(p1: jnp.ndarray, p2: jnp.ndarray, fix_scale: bool):
    """Closed-form similarity from aligned 3D point sets [..., K, 3]:
    returns Sim3 S12 with p1 ~ s R p2 + t (Horn 1987; reference
    Sim3Solver::ComputeSim3, Sim3Solver.cc:226-328)."""
    c1 = jnp.mean(p1, axis=-2, keepdims=True)
    c2 = jnp.mean(p2, axis=-2, keepdims=True)
    x1 = p1 - c1
    x2 = p2 - c2
    M = jnp.einsum('...ki,...kj->...ij', x2, x1)   # correlation (2 -> 1)
    # 4x4 N matrix from M (Horn's quaternion method)
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], axis=-2)
    w, v = jnp.linalg.eigh(N)
    q = v[..., :, -1]                               # max eigenvalue -> [w,x,y,z]
    q = lie.quat_normalize(q)
    # rotate x2 into frame 1
    rx2 = lie.quat_rotate(q[..., None, :], x2)
    if fix_scale:
        s = jnp.ones(q.shape[:-1])
    else:
        # s = sum(x1 . R x2) / sum(|R x2|^2)   (Sim3Solver.cc:292-311)
        num = jnp.sum(x1 * rx2, axis=(-1, -2))
        den = jnp.maximum(jnp.sum(rx2 * rx2, axis=(-1, -2)), 1e-12)
        s = num / den
    t = c1[..., 0, :] - s[..., None] * lie.quat_rotate(q, c2[..., 0, :])
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def sim3_ransac(key, p1: jnp.ndarray, p2: jnp.ndarray, uv1: jnp.ndarray,
                uv2: jnp.ndarray, valid: jnp.ndarray, K: jnp.ndarray,
                max_err1: jnp.ndarray, max_err2: jnp.ndarray,
                fix_scale: bool, iters: int = 128,
                min_inliers: int = 20) -> Sim3Result:
    """RANSAC Horn on matched camera-frame points.

    p1, p2: [N, 3] matched points in camera frames 1 / 2
    uv1, uv2: [N, 2] their pixel coords; max_err*: per-point chi2 gates
    (9.210 * sigma^2, Sim3Solver.cc:87-88).
    """
    from orb_slam2_tpu.solvers.twoview import _sample_sets
    n = p1.shape[0]
    sets = _sample_sets(key, valid, iters, 3)            # [iters, 3]
    S = horn_sim3(p1[sets], p2[sets], fix_scale)         # [iters, 8]

    def check(S):
        S21 = lie.sim3_inverse(S)
        # project p2 through S12 into cam1 and compare with uv1 (both ways)
        q1 = camera.project(K, lie.sim3_apply(S[None], p2))
        q2 = camera.project(K, lie.sim3_apply(S21[None], p1))
        e1 = jnp.sum((q1 - uv1) ** 2, -1)
        e2 = jnp.sum((q2 - uv2) ** 2, -1)
        inl = valid & (e1 < max_err1) & (e2 < max_err2)
        return inl

    inl = jax.vmap(check)(S)                             # [iters, N]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    n_in = counts[best]
    return Sim3Result(ok=n_in >= min_inliers, S12=S[best],
                      inliers=inl[best], n_inliers=n_in)


def optimize_sim3(S12: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray,
                  uv1: jnp.ndarray, uv2: jnp.ndarray, valid: jnp.ndarray,
                  K: jnp.ndarray, inv_sigma1: jnp.ndarray,
                  inv_sigma2: jnp.ndarray, fix_scale: bool,
                  th2: float = 10.0, iters: int = 10):
    """LM on the 7-dof relative Sim3 with paired projection edges
    (reference Optimizer::OptimizeSim3, Optimizer.cc:1046-1241).

    Returns (S12, n_inliers, inlier mask)."""

    def residuals(S):
        S21 = lie.sim3_inverse(S)
        q1 = camera.project(K, lie.sim3_apply(S[None], p2))
        q2 = camera.project(K, lie.sim3_apply(S21[None], p1))
        r1 = (uv1 - q1) * jnp.sqrt(inv_sigma1)[:, None]
        r2 = (uv2 - q2) * jnp.sqrt(inv_sigma2)[:, None]
        return r1, r2

    def chi2(S):
        r1, r2 = residuals(S)
        return jnp.sum(r1 * r1, -1), jnp.sum(r2 * r2, -1)

    def step(S, active, lam):
        def f(xi):
            Sx = lie.sim3_retract(S, xi)
            r1, r2 = residuals(Sx)
            return jnp.concatenate([r1, r2], 0)          # [2N, 2]

        J = jax.jacfwd(f)(jnp.zeros(7))                  # [2N, 2, 7]
        r = f(jnp.zeros(7))
        a2 = jnp.concatenate([active, active])
        w = a2.astype(jnp.float32)
        H = jnp.einsum('nij,nik,n->jk', J, J, w)
        g = jnp.einsum('nij,ni,n->j', J, r, w)
        if fix_scale:
            # freeze the scale direction
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            g = g.at[6].set(0.0)
        dx = jnp.linalg.solve(H + lam * jnp.eye(7), -g)
        S_new = lie.sim3_retract(S, dx)
        c_old = jnp.sum(jnp.where(a2, jnp.sum(r * r, -1), 0.0))
        r1n, r2n = residuals(S_new)
        rn = jnp.concatenate([r1n, r2n], 0)
        c_new = jnp.sum(jnp.where(a2, jnp.sum(rn * rn, -1), 0.0))
        ok = (c_new < c_old) & jnp.all(jnp.isfinite(S_new))
        S = jnp.where(ok, S_new, S)
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-9, 1e4)
        return S, lam

    active = valid
    lam = jnp.float32(1e-3)
    for i in range(iters):
        S12, lam = step(S12, active, lam)
        if i == iters // 2:
            # mid-way outlier rejection (Optimizer.cc:1175-1192)
            c1, c2 = chi2(S12)
            active = valid & (c1 < th2) & (c2 < th2)

    c1, c2 = chi2(S12)
    inl = valid & (c1 < th2) & (c2 < th2)
    return S12, jnp.sum(inl.astype(jnp.int32)), inl

"""Monocular two-view initialization: batched H/F RANSAC + motion recovery.

Replaces the reference `Initializer` (Initializer.cc) — which scores
homography and fundamental hypotheses in two std::threads over 200 scalar
RANSAC iterations — with fully batched math: all 200 hypotheses for BOTH
models are estimated and scored as single vmapped SVD/matmul pipelines, and
model selection / motion recovery follows the reference's decision rules:

* 8-point sets, mean/abs-dev normalization     (Initializer.cc:749-796)
* H scored by symmetric transfer error, th=5.991 (Initializer.cc:305-388)
* F scored by point-line error, th=3.841 scored against 5.991
  so SH and SF are comparable                   (Initializer.cc:390-468)
* RH = SH/(SH+SF) > 0.40 chooses H             (Initializer.cc:112-118)
* F: E = K^T F K, 4-way decomposition + cheirality vote, winner must have
  >=90% of max votes unique and >=50 points     (Initializer.cc:470-570)
* H: Faugeras 8-motion decomposition, same vote  (Initializer.cc:572-732)
* parallax = 50th-largest triangulation angle    (Initializer.cc:896-902)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.solvers import triangulate as tri
from orb_slam2_tpu.config import InitConfig


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray          # bool scalar
    T21: jnp.ndarray         # [7] SE3 of frame2 w.r.t. frame1 (Tcw with cam1=world)
    points: jnp.ndarray      # [N, 3] triangulated world points
    good: jnp.ndarray        # [N] bool triangulation inlier mask
    used_h: jnp.ndarray      # bool: homography model chosen


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _normalize(pts: jnp.ndarray, valid: jnp.ndarray):
    """Reference Normalize (Initializer.cc:749-796): zero-mean, unit mean
    absolute deviation per axis. Returns (normalized pts, 3x3 transform T)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (pts * w[:, None]).sum(0) / n
    dev = (jnp.abs(pts - mean) * w[:, None]).sum(0) / n
    s = 1.0 / jnp.maximum(dev, 1e-8)
    pn = (pts - mean) * s
    T = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return pn, T


def _sample_sets(key, valid: jnp.ndarray, iters: int, k: int) -> jnp.ndarray:
    """[iters, k] indices drawn among valid entries (with replacement across
    sets; nearly-distinct within a set by stratified draws)."""
    n = valid.shape[0]
    order = jnp.argsort(~valid)          # valid indices first
    nv = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    u = jax.random.uniform(key, (iters, k))
    # stratified: slot j samples in [j/k, (j+1)/k) of the valid range
    strat = (u + jnp.arange(k)[None, :]) / k
    idx = jnp.clip((strat * nv).astype(jnp.int32), 0, n - 1)
    return order[idx]


def _homography_dlt(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """[S, 8, 2] point sets -> [S, 3, 3] homographies (p2 ~ H p1)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    rows_a = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], -1)
    rows_b = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1)
    A = jnp.concatenate([rows_a, rows_b], axis=-2)  # [S, 16, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[..., -1, :]
    return h.reshape(h.shape[:-1] + (3, 3))


def _fundamental_8pt(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """[S, 8, 2] -> [S, 3, 3] rank-2 fundamental matrices (x2^T F x1 = 0)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], -1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[..., -1, :].reshape(A.shape[:-2] + (3, 3))
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    return u @ (s[..., :, None] * vt2)


def _score_h(H: jnp.ndarray, Hinv: jnp.ndarray, p1: jnp.ndarray,
             p2: jnp.ndarray, valid: jnp.ndarray, sigma: float, th: float):
    """Reference CheckHomography (Initializer.cc:305-388). Returns
    (score [S], inliers [S, N])."""
    inv_s2 = 1.0 / (sigma * sigma)

    def transfer(Hm, src, dst):
        ph = jnp.concatenate([src, jnp.ones_like(src[..., :1])], -1)
        q = jnp.einsum('sij,nj->sni', Hm, ph)
        q = q[..., :2] / jnp.where(jnp.abs(q[..., 2:]) > 1e-12, q[..., 2:], 1e-12)
        return jnp.sum((dst[None] - q) ** 2, -1)  # [S, N]

    chi1 = transfer(Hinv, p2, p1) * inv_s2
    chi2 = transfer(H, p1, p2) * inv_s2
    ok = (chi1 < th) & (chi2 < th) & valid[None]
    score = jnp.where(valid[None] & (chi1 < th), th - chi1, 0.0) + \
            jnp.where(valid[None] & (chi2 < th), th - chi2, 0.0)
    return score.sum(-1), ok


def _score_f(F: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray,
             valid: jnp.ndarray, sigma: float, th: float, th_score: float):
    """Reference CheckFundamental (Initializer.cc:390-468)."""
    inv_s2 = 1.0 / (sigma * sigma)
    ph1 = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], -1)
    ph2 = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], -1)
    l2 = jnp.einsum('sij,nj->sni', F, ph1)           # line in image 2
    l1 = jnp.einsum('sji,nj->sni', F, ph2)           # line in image 1
    d2 = jnp.einsum('ni,sni->sn', ph2, l2) ** 2 / jnp.maximum(
        l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12)
    d1 = jnp.einsum('ni,sni->sn', ph1, l1) ** 2 / jnp.maximum(
        l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12)
    chi1 = d1 * inv_s2
    chi2 = d2 * inv_s2
    ok = (chi1 < th) & (chi2 < th) & valid[None]
    score = jnp.where(valid[None] & (chi2 < th), th_score - chi2, 0.0) + \
            jnp.where(valid[None] & (chi1 < th), th_score - chi1, 0.0)
    return score.sum(-1), ok


def _check_rt(R: jnp.ndarray, t: jnp.ndarray, K: jnp.ndarray,
              uv1: jnp.ndarray, uv2: jnp.ndarray, valid: jnp.ndarray,
              sigma2_th: float):
    """Reference CheckRT (Initializer.cc:798-907), batched over points.
    Returns (n_good, parallax_deg, points [N,3], good [N])."""
    T1 = lie.se3_identity()
    T2 = lie.se3_from_Rt(R, t)
    xn1 = (uv1 - K[2:4]) / K[:2]
    xn2 = (uv2 - K[2:4]) / K[:2]
    pw = tri.triangulate_dlt(T1[None], T2[None], xn1, xn2)
    finite = jnp.all(jnp.isfinite(pw), -1)
    c1 = jnp.zeros(3)
    c2 = -lie.quat_rotate(lie.quat_conj(lie.se3_q(T2)), lie.se3_t(T2))
    cosp = tri.parallax_cos(c1, c2, pw)
    z1 = tri.depth_in(T1, pw)
    z2 = tri.depth_in(T2, pw)
    e1 = tri.reprojection_error(T1, K, pw, uv1)
    e2 = tri.reprojection_error(T2, K, pw, uv2)
    low_parallax = cosp > 0.99998                      # Initializer.cc:857
    good = (valid & finite & ~low_parallax &
            (z1 > 0) & (z2 > 0) & (e1 < sigma2_th) & (e2 < sigma2_th))
    n_good = jnp.sum(good.astype(jnp.int32))
    # parallax of the 50th best-separated good point (Initializer.cc:896-902)
    cos_sorted = jnp.sort(jnp.where(good, cosp, 1.0))  # ascending
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    parallax_deg = jnp.rad2deg(jnp.arccos(jnp.clip(cos_sorted[idx], -1.0, 1.0)))
    parallax_deg = jnp.where(n_good > 0, parallax_deg, 0.0)
    return n_good, parallax_deg, pw, good


def _decompose_e(E: jnp.ndarray):
    """E -> (R1, R2, t) candidate motions (Initializer.cc:909-929)."""
    u, _, vt = jnp.linalg.svd(E)
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    R1 = u @ W @ vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = u @ W.T @ vt
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    return R1, R2, t


def _decompose_h(H: jnp.ndarray, K: jnp.ndarray):
    """Faugeras SVD homography decomposition -> 8 (R, t) hypotheses
    (Initializer.cc:584-686)."""
    Km = jnp.asarray([[K[0], 0, K[2]], [0, K[1], K[3]], [0, 0, 1.0]])
    Kinv = jnp.asarray([[1.0 / K[0], 0, -K[2] / K[0]],
                        [0, 1.0 / K[1], -K[3] / K[1]], [0, 0, 1.0]])
    A = Kinv @ H @ Km
    U, d, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = d[0], d[1], d[2]
    den = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    aux1 = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0) / den)
    aux3 = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0) / den)
    x1s = jnp.asarray([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.asarray([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # case d' = d2 (Initializer.cc:609-644)
    aux_st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 + d3) * d2, 1e-12)
    ctheta = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    stheta = jnp.asarray([1.0, -1.0, -1.0, 1.0]) * aux_st
    for i in range(4):
        Rp = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        Rp = Rp.at[0, 0].set(ctheta).at[0, 2].set(-stheta[i])
        Rp = Rp.at[2, 0].set(stheta[i]).at[2, 2].set(ctheta)
        R = s * U @ Rp @ Vt
        tp = jnp.asarray([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    # case d' = -d2 (Initializer.cc:646-686)
    aux_sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 - d3) * d2, 1e-12)
    cphi = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sphi = jnp.asarray([1.0, -1.0, -1.0, 1.0]) * aux_sp
    for i in range(4):
        Rp = jnp.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
        Rp = Rp.at[0, 0].set(cphi).at[0, 2].set(sphi[i])
        Rp = Rp.at[2, 0].set(sphi[i]).at[2, 2].set(-cphi)
        R = s * U @ Rp @ Vt
        tp = jnp.asarray([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    return jnp.stack(Rs), jnp.stack(ts)


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------

def initialize(key, K: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray,
               valid: jnp.ndarray, cfg: InitConfig = InitConfig()) -> TwoViewResult:
    """Two-view bootstrap from matched undistorted pixel coords.

    uv1, uv2: [N, 2] matched pairs (row-aligned), valid: [N] bool.
    """
    iters = cfg.ransac_iters
    sigma = cfg.sigma
    n = uv1.shape[0]

    p1n, T1n = _normalize(uv1, valid)
    p2n, T2n = _normalize(uv2, valid)
    T2inv = jnp.linalg.inv(T2n)

    k1, k2 = jax.random.split(key)
    sets = _sample_sets(k1, valid, iters, 8)

    s1 = p1n[sets]          # [iters, 8, 2]
    s2 = p2n[sets]

    Hn = _homography_dlt(s1, s2)
    H = T2inv @ Hn @ T1n                     # denormalized, p2 ~ H p1
    Hinv = jnp.linalg.inv(H)
    score_h, inl_h = _score_h(H, Hinv, uv1, uv2, valid, sigma, cfg.h_inlier_th)

    Fn = _fundamental_8pt(s1, s2)
    F = T2n.T @ Fn @ T1n
    score_f, inl_f = _score_f(F, uv1, uv2, valid, sigma,
                              cfg.f_inlier_th, cfg.score_th)

    bh = jnp.argmax(score_h)
    bf = jnp.argmax(score_f)
    SH = score_h[bh]
    SF = score_f[bf]
    RH = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = RH > cfg.rh_homography_th

    sigma2_th = 4.0 * sigma * sigma          # CheckRT th2 (Initializer.cc:806)
    # cheirality voting runs over the winning model's inliers, and the 0.9N
    # gate counts those inliers (reference ReconstructF/H N = model inliers)
    f_valid = inl_f[bf]
    h_valid = inl_h[bh]
    n_f = jnp.sum(f_valid.astype(jnp.int32))
    n_h = jnp.sum(h_valid.astype(jnp.int32))
    min_good = jnp.maximum((cfg.cheirality_frac * n_f).astype(jnp.int32),
                           cfg.min_triangulated)

    # --- F path: 4 hypotheses ---
    Fbest = F[bf]
    Km = jnp.asarray([[K[0], 0, K[2]], [0, K[1], K[3]], [0, 0, 1.0]])
    E = Km.T @ Fbest @ Km
    R1, R2, t = _decompose_e(E)
    f_R = jnp.stack([R1, R1, R2, R2])
    f_t = jnp.stack([t, -t, t, -t])

    # --- H path: 8 hypotheses ---
    h_R, h_t = _decompose_h(H[bh], K)

    Rall = jnp.concatenate([f_R, h_R], 0)    # [12, 3, 3]
    tall = jnp.concatenate([f_t, h_t], 0)
    vall = jnp.concatenate([jnp.broadcast_to(f_valid, (4,) + f_valid.shape),
                            jnp.broadcast_to(h_valid, (8,) + h_valid.shape)], 0)

    ng, par, pts, good = jax.vmap(
        lambda R, tt, vv: _check_rt(R, tt, K, uv1, uv2, vv, sigma2_th))(
            Rall, tall, vall)

    f_ng, h_ng = ng[:4], ng[4:]
    f_par, h_par = par[:4], par[4:]

    # F selection (Initializer.cc:500-567)
    f_max = jnp.max(f_ng)
    f_similar = jnp.sum((f_ng > cfg.unique_winner_frac * f_max).astype(jnp.int32))
    f_win = jnp.argmax(f_ng)
    f_ok = ((f_max >= min_good) & (f_similar == 1) &
            (f_par[f_win] > cfg.min_parallax_deg))

    # H selection (Initializer.cc:706-731)
    h_sorted = jnp.sort(h_ng)
    h_best, h_second = h_sorted[-1], h_sorted[-2]
    h_win = jnp.argmax(h_ng)
    h_ok = ((h_second < cfg.second_best_frac * h_best) &
            (h_par[h_win] > cfg.min_parallax_deg) &
            (h_best > cfg.min_triangulated) &
            (h_best > cfg.cheirality_frac * n_h))

    win = jnp.where(use_h, 4 + h_win, f_win)
    ok = jnp.where(use_h, h_ok, f_ok)

    T21 = lie.se3_from_Rt(Rall[win], tall[win])
    return TwoViewResult(ok=ok, T21=T21, points=pts[win], good=good[win],
                         used_h=use_h)

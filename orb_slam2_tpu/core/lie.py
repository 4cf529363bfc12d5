"""SO3 / SE3 / Sim3 Lie-group operations on batched arrays.

Replaces the reference's g2o `SE3Quat` / `Sim3` classes and the cv::Mat <->
Eigen `Converter` glue (reference Thirdparty/g2o/g2o/types/se3quat.h, sim3.h,
src/Converter.cc) with pure-jnp functions over packed arrays, usable under
`jit`/`vmap`/`grad` and on any leading batch shape.

Representations
---------------
* rotation:  unit quaternion ``q = [w, x, y, z]``  (shape ``[..., 4]``)
* SE3:       ``T = [qw, qx, qy, qz, tx, ty, tz]``  (shape ``[..., 7]``)
* Sim3:      ``S = [qw, qx, qy, qz, tx, ty, tz, s]`` (shape ``[..., 8]``)

All poses are world-to-camera (Tcw) unless noted, matching the reference's
convention (Frame.mTcw).  Tangent vectors follow g2o's ordering
``[rho(3), phi(3)]`` = translation first for SE3 exp (se3quat.h:205-225), and
``[rho, phi, sigma]`` for Sim3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _safe_norm(x, axis=-1, keepdims=False):
    """norm with NaN-free gradient at 0 (jnp.linalg.norm's grad at the
    origin is NaN, which poisons jacfwd through exp/log maps at xi = 0)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, 1e-24))


# ---------------------------------------------------------------------------
# Quaternion (SO3)
# ---------------------------------------------------------------------------

def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = _safe_norm(q, keepdims=True)
    q = q / jnp.maximum(n, _EPS)
    # canonical sign: w >= 0
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by quaternions q [..., 4]."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion, branchless (Shepperd's
    method computed on all four candidates, pick the best-conditioned)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate squared magnitudes (4w^2, 4x^2, 4y^2, 4z^2)
    qs = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    case = jnp.argmax(qs, axis=-1)
    r = jnp.sqrt(jnp.maximum(jnp.take_along_axis(qs, case[..., None], -1)[..., 0], _EPS))
    inv = 0.5 / r
    q0 = jnp.stack([0.5 * r, (m21 - m12) * inv, (m02 - m20) * inv, (m10 - m01) * inv], -1)
    q1 = jnp.stack([(m21 - m12) * inv, 0.5 * r, (m01 + m10) * inv, (m02 + m20) * inv], -1)
    q2 = jnp.stack([(m02 - m20) * inv, (m01 + m10) * inv, 0.5 * r, (m12 + m21) * inv], -1)
    q3 = jnp.stack([(m10 - m01) * inv, (m02 + m20) * inv, (m12 + m21) * inv, 0.5 * r], -1)
    qcands = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qcands, case[..., None, None], axis=-2)[..., 0, :]
    return quat_normalize(q)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> quaternion."""
    theta = _safe_norm(phi, keepdims=True)
    half = 0.5 * theta
    # sin(x)/x stable near 0
    k = jnp.where(theta > _EPS, jnp.sin(half) / jnp.maximum(theta, _EPS), 0.5)
    w = jnp.cos(half)
    return quat_normalize(jnp.concatenate([w, k * phi], axis=-1))


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> axis-angle [..., 3]."""
    q = quat_normalize(q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    n = _safe_norm(v, keepdims=True)
    theta = 2.0 * jnp.arctan2(n, w)
    k = jnp.where(n > _EPS, theta / jnp.maximum(n, _EPS), 2.0)
    return k * v


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [..., 3, 3] of v [..., 3]."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------

def se3_identity(shape=()) -> jnp.ndarray:
    T = jnp.zeros(shape + (7,))
    return T.at[..., 0].set(1.0)


def se3(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([quat_normalize(q), t], axis=-1)


def se3_from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return se3(matrix_to_quat(R), t)


def se3_q(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :4]


def se3_t(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., 4:7]


def se3_apply(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """p_cam = R p + t."""
    return quat_rotate(se3_q(T), p) + se3_t(T)


def se3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A*B (apply B first)."""
    q = quat_mul(se3_q(A), se3_q(B))
    t = quat_rotate(se3_q(A), se3_t(B)) + se3_t(A)
    return se3(q, t)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    qi = quat_conj(se3_q(T))
    ti = -quat_rotate(qi, se3_t(T))
    return se3(qi, ti)


def se3_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] homogeneous matrix."""
    R = quat_to_matrix(se3_q(T))
    t = se3_t(T)[..., :, None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def _so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO3 left Jacobian J_l(phi), [..., 3, 3]."""
    theta = _safe_norm(phi)
    th2 = theta * theta
    W = hat(phi)
    W2 = W @ W
    small = theta < 1e-5
    a = jnp.where(small, 0.5 - th2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(th2, _EPS))
    b = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(th2 * theta, _EPS))
    I = jnp.broadcast_to(jnp.eye(3), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * W2


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Tangent [..., 6] = [rho, phi] -> SE3 (t = J_l(phi) rho), matching
    g2o SE3Quat::exp ordering (se3quat.h:205)."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    J = _so3_left_jacobian(phi)
    t = jnp.einsum('...ij,...j->...i', J, rho)
    return se3(q, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    phi = so3_log(se3_q(T))
    J = _so3_left_jacobian(phi)
    rho = jnp.linalg.solve(J, se3_t(T)[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_retract(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplied exp-map update: exp(xi) * T (the g2o VertexSE3Expmap
    update rule, types_six_dof_expmap.h:73-76)."""
    return se3_compose(se3_exp(xi), T)


# ---------------------------------------------------------------------------
# Sim3
# ---------------------------------------------------------------------------

def sim3_identity(shape=()) -> jnp.ndarray:
    S = jnp.zeros(shape + (8,))
    return S.at[..., 0].set(1.0).at[..., 7].set(1.0)


def sim3(q: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([quat_normalize(q), t, s[..., None] if s.ndim == q.ndim - 1 else s], axis=-1)


def sim3_from_se3(T: jnp.ndarray, s=None) -> jnp.ndarray:
    scale = jnp.ones(T.shape[:-1] + (1,), T.dtype) if s is None else jnp.broadcast_to(jnp.asarray(s, T.dtype), T.shape[:-1] + (1,))
    return jnp.concatenate([T, scale], axis=-1)


def sim3_q(S): return S[..., :4]
def sim3_t(S): return S[..., 4:7]
def sim3_s(S): return S[..., 7]


def sim3_apply(S: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """p' = s R p + t  (g2o Sim3::map, sim3.h)."""
    return sim3_s(S)[..., None] * quat_rotate(sim3_q(S), p) + sim3_t(S)


def sim3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    q = quat_mul(sim3_q(A), sim3_q(B))
    s = sim3_s(A) * sim3_s(B)
    t = sim3_s(A)[..., None] * quat_rotate(sim3_q(A), sim3_t(B)) + sim3_t(A)
    return jnp.concatenate([quat_normalize(q), t, s[..., None]], axis=-1)


def sim3_inverse(S: jnp.ndarray) -> jnp.ndarray:
    qi = quat_conj(sim3_q(S))
    si = 1.0 / sim3_s(S)
    ti = -si[..., None] * quat_rotate(qi, sim3_t(S))
    return jnp.concatenate([qi, ti, si[..., None]], axis=-1)


def sim3_to_se3(S: jnp.ndarray) -> jnp.ndarray:
    """Recover SE3 = [R, t/s] from a Sim3 (reference Optimizer.cc:991-1010
    essential-graph recovery)."""
    t = sim3_t(S) / sim3_s(S)[..., None]
    return se3(sim3_q(S), t)


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Tangent [..., 7] = [rho, phi, sigma] -> Sim3 (first-order-correct
    closed form; scale s = exp(sigma), translation via the Sim3 left
    Jacobian V_s rho)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    q = so3_exp(phi)
    s = jnp.exp(sigma)
    theta = _safe_norm(phi)
    W = hat(phi)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3), W.shape)
    # coefficients of V = A*I + B*W + C*W2 (Strasdat's Sim3 exp; series-safe)
    eps = 1e-5
    th2 = jnp.maximum(theta * theta, _EPS)
    s_m1 = s - 1.0
    sig = sigma
    small_sig = jnp.abs(sig) < eps
    small_th = theta < eps
    A = jnp.where(small_sig, 1.0 + sig / 2.0, s_m1 / jnp.where(small_sig, 1.0, sig))
    c0 = jnp.cos(theta)
    s0 = jnp.sin(theta)
    denom = jnp.maximum(sig * sig + th2, _EPS)
    # B,C general case (sigma != 0, theta != 0)
    a_gen = (s * s0 * sig + (1.0 - s * c0) * theta) / jnp.maximum(theta * denom, _EPS)
    b_gen = (A - ((s * c0 - 1.0) * sig + s * s0 * theta) / denom) / th2
    # sigma ~ 0 limits
    a_sig0 = (1.0 - c0) / th2
    b_sig0 = (theta - s0) / jnp.maximum(th2 * theta, _EPS)
    B = jnp.where(small_sig, a_sig0, jnp.where(small_th, 0.5 * A, a_gen))
    C = jnp.where(small_sig, b_sig0, jnp.where(small_th, A / 6.0, b_gen))
    V = A[..., None, None] * I + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum('...ij,...j->...i', V, rho)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def sim3_retract(S: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """exp(xi) * S (left-multiplied update, matching VertexSim3Expmap)."""
    return sim3_compose(sim3_exp(xi), S)


def _sim3_V(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The translation Jacobian V(phi, sigma) used by sim3_exp: t = V rho."""
    s = jnp.exp(sigma)
    theta = _safe_norm(phi)
    W = hat(phi)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3), W.shape)
    eps = 1e-5
    th2 = jnp.maximum(theta * theta, _EPS)
    small_sig = jnp.abs(sigma) < eps
    small_th = theta < eps
    A = jnp.where(small_sig, 1.0 + sigma / 2.0,
                  (s - 1.0) / jnp.where(small_sig, 1.0, sigma))
    c0 = jnp.cos(theta)
    s0 = jnp.sin(theta)
    denom = jnp.maximum(sigma * sigma + th2, _EPS)
    a_gen = (s * s0 * sigma + (1.0 - s * c0) * theta) / jnp.maximum(theta * denom, _EPS)
    b_gen = (A - ((s * c0 - 1.0) * sigma + s * s0 * theta) / denom) / th2
    a_sig0 = (1.0 - c0) / th2
    b_sig0 = (theta - s0) / jnp.maximum(th2 * theta, _EPS)
    B = jnp.where(small_sig, a_sig0, jnp.where(small_th, 0.5 * A, a_gen))
    C = jnp.where(small_sig, b_sig0, jnp.where(small_th, A / 6.0, b_gen))
    return A[..., None, None] * I + B[..., None, None] * W + C[..., None, None] * W2


def sim3_log(S: jnp.ndarray) -> jnp.ndarray:
    """Inverse of sim3_exp: Sim3 -> tangent [..., 7] = [rho, phi, sigma]."""
    phi = so3_log(sim3_q(S))
    sigma = jnp.log(jnp.maximum(sim3_s(S), _EPS))
    V = _sim3_V(phi, sigma)
    rho = jnp.linalg.solve(V, sim3_t(S)[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)

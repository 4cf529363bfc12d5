"""Batched two-view DLT triangulation.

Replaces the reference's per-point 4x4 SVD (`Initializer::Triangulate`
Initializer.cc:734-747 and LocalMapping.cc:318-339) with one vmapped
linear solve over all candidate pairs at once.
"""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam2_tpu.core import lie


def triangulate_dlt(T1: jnp.ndarray, T2: jnp.ndarray,
                    xn1: jnp.ndarray, xn2: jnp.ndarray) -> jnp.ndarray:
    """Triangulate in world frame.

    T1, T2: SE3 world-to-camera, broadcastable to [..., 7]
    xn1, xn2: normalized image coords [..., 2] (x/z, y/z) in cam 1 / cam 2
    Returns world points [..., 3].

    Uses the DLT system A X = 0 built from both projection equations, solved
    via the normal equations of the 4x3 inhomogeneous form (fixing X_w = 1
    is ill-posed for far points; instead solve min |A X| with |X|=1 via
    eigendecomposition of A^T A, 4x4 symmetric — batched and TPU-friendly).
    """
    P1 = lie.se3_matrix(T1)[..., :3, :]  # [..., 3, 4]
    P2 = lie.se3_matrix(T2)[..., :3, :]
    r1 = xn1[..., 0:1, None] * P1[..., 2:3, :] - P1[..., 0:1, :]
    r2 = xn1[..., 1:2, None] * P1[..., 2:3, :] - P1[..., 1:2, :]
    r3 = xn2[..., 0:1, None] * P2[..., 2:3, :] - P2[..., 0:1, :]
    r4 = xn2[..., 1:2, None] * P2[..., 2:3, :] - P2[..., 1:2, :]
    A = jnp.concatenate([r1, r2, r3, r4], axis=-2)  # [..., 4, 4]
    AtA = jnp.einsum('...ij,...ik->...jk', A, A)
    # eigenvector of smallest eigenvalue of symmetric 4x4
    w, v = jnp.linalg.eigh(AtA)
    X = v[..., :, 0]
    Xh = X / jnp.where(jnp.abs(X[..., 3:4]) > 1e-12, X[..., 3:4], 1e-12)
    return Xh[..., :3]


def reprojection_error(T: jnp.ndarray, K: jnp.ndarray, pw: jnp.ndarray,
                       uv: jnp.ndarray) -> jnp.ndarray:
    """Squared pixel reprojection error [...] of world points into a view."""
    from orb_slam2_tpu.core import camera
    pc = lie.se3_apply(T, pw)
    pr = camera.project(K, pc)
    return jnp.sum((pr - uv) ** 2, axis=-1)


def depth_in(T: jnp.ndarray, pw: jnp.ndarray) -> jnp.ndarray:
    return lie.se3_apply(T, pw)[..., 2]


def parallax_cos(c1: jnp.ndarray, c2: jnp.ndarray, pw: jnp.ndarray) -> jnp.ndarray:
    """cos of the ray angle between camera centers c1, c2 and points pw."""
    d1 = pw - c1
    d2 = pw - c2
    n1 = jnp.linalg.norm(d1, axis=-1)
    n2 = jnp.linalg.norm(d2, axis=-1)
    return jnp.sum(d1 * d2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)

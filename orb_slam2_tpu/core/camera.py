"""Pinhole camera model: projection, radial-tangential distortion, stereo.

Replaces the reference's per-frame OpenCV calls (`cv::undistortPoints`
Frame.cc:404-434, projection arithmetic scattered through `isInFrustum`
Frame.cc:269-325 and the matchers) with batched pure functions.

Intrinsics are packed as ``K = [fx, fy, cx, cy]`` and distortion as
``dist = [k1, k2, p1, p2, k3]``; all functions take arrays with arbitrary
leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam2_tpu.config import CameraConfig


def intrinsics(cfg: CameraConfig) -> jnp.ndarray:
    return jnp.asarray([cfg.fx, cfg.fy, cfg.cx, cfg.cy], dtype=jnp.float32)


def distortion(cfg: CameraConfig) -> jnp.ndarray:
    return jnp.asarray([cfg.k1, cfg.k2, cfg.p1, cfg.p2, cfg.k3], dtype=jnp.float32)


def project(K: jnp.ndarray, p_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points [..., 3] -> pixel coords [..., 2] (no distortion —
    the engine works on undistorted keypoints, like the reference after
    UndistortKeyPoints)."""
    z = p_cam[..., 2:3]
    xy = p_cam[..., :2] / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    return xy * K[..., :2] + K[..., 2:4]


def unproject(K: jnp.ndarray, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels [..., 2] + depth [...] -> camera-frame 3D points [..., 3]
    (reference Frame::UnprojectStereo, Frame.cc:666-680)."""
    xy = (uv - K[..., 2:4]) / K[..., :2]
    d = depth[..., None]
    return jnp.concatenate([xy * d, d], axis=-1)


def distort_normalized(dist: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(K: jnp.ndarray, dist: jnp.ndarray, uv: jnp.ndarray,
                     iters: int = 8) -> jnp.ndarray:
    """Undistort pixel keypoints (reference Frame::UndistortKeyPoints uses
    cv::undistortPoints; this is the same fixed-point iteration, batched).

    Returns undistorted *pixel* coordinates under the same K.
    """
    xy_d = (uv - K[..., 2:4]) / K[..., :2]
    xy = xy_d
    for _ in range(iters):
        d = distort_normalized(dist, xy)
        xy = xy_d - (d - xy)
    return xy * K[..., :2] + K[..., 2:4]


def stereo_right_u(K: jnp.ndarray, bf: jnp.ndarray, uv: jnp.ndarray,
                   depth: jnp.ndarray) -> jnp.ndarray:
    """Virtual right-image u coordinate uR = u - bf/z (reference
    Frame::ComputeStereoFromRGBD, Frame.cc:643-664)."""
    z = jnp.maximum(depth, 1e-9)
    return uv[..., 0] - bf / z


def in_image(uv: jnp.ndarray, bounds: jnp.ndarray) -> jnp.ndarray:
    """bounds = [min_x, max_x, min_y, max_y] (reference mnMinX... Frame.cc:436)."""
    return ((uv[..., 0] >= bounds[0]) & (uv[..., 0] < bounds[1]) &
            (uv[..., 1] >= bounds[2]) & (uv[..., 1] < bounds[3]))

"""Synthetic sequence generator with exact ground truth.

The evaluation datasets of the reference (TUM/KITTI/EuRoC, README.md:95-167)
are not available in this environment (zero egress), so sequences are
synthesized: a sparse cloud of corner-rich "sprite" landmarks plus a textured
far backdrop, rendered along a smooth camera trajectory.  Ground-truth Twc
per frame enables exact ATE RMSE measurement (io/evaluate.py), which stands
in for the TUM benchmark scripts as the de-facto test harness (SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from orb_slam2_tpu.config import CameraConfig


@dataclasses.dataclass
class SyntheticSequence:
    images: np.ndarray     # [F, H, W] float32 0..255
    depths: np.ndarray     # [F, H, W] float32 (0 = invalid)
    poses_twc: np.ndarray  # [F, 7] ground truth camera-to-world
    timestamps: np.ndarray  # [F]
    points: np.ndarray     # [P, 3] landmark ground truth


def _quat_from_axis_angle(axis, angle):
    axis = np.asarray(axis, np.float64)
    n = np.linalg.norm(axis)
    if n < 1e-12:
        return np.array([1.0, 0, 0, 0])
    axis = axis / n
    return np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw])


def _quat_rot(q, v):
    w, x, y, z = q
    qv = np.array([x, y, z])
    t = 2 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def xyz_trajectory(n_frames: int, amp=0.35, rot_amp=0.04) -> np.ndarray:
    """fr1/xyz-style trajectory: smooth translation along all three axes with
    mild rotation.  Returns Twc [F, 7] (quat wxyz + t)."""
    ts = np.linspace(0, 4 * np.pi, n_frames)
    poses = np.zeros((n_frames, 7))
    for i, s in enumerate(ts):
        t = np.array([amp * np.sin(s), amp * 0.6 * np.sin(0.7 * s + 1.0),
                      amp * 0.4 * np.sin(0.5 * s)])
        qx = _quat_from_axis_angle([0, 1, 0], rot_amp * np.sin(0.8 * s))
        qy = _quat_from_axis_angle([1, 0, 0], rot_amp * 0.7 * np.sin(0.6 * s + 0.5))
        q = _quat_mul(qx, qy)
        poses[i, :4] = q / np.linalg.norm(q)
        poses[i, 4:] = t
    return poses


def forward_trajectory(n_frames: int, speed=0.08, yaw_rate=0.002) -> np.ndarray:
    """KITTI-style: forward motion with slow yaw."""
    poses = np.zeros((n_frames, 7))
    q = np.array([1.0, 0, 0, 0])
    pos = np.zeros(3)
    for i in range(n_frames):
        poses[i, :4] = q
        poses[i, 4:] = pos
        fwd = _quat_rot(q, np.array([0, 0, 1.0]))
        pos = pos + speed * fwd
        q = _quat_mul(q, _quat_from_axis_angle([0, 1, 0], yaw_rate))
        q = q / np.linalg.norm(q)
    return poses


def generate(cam: CameraConfig, n_frames: int = 120, n_points: int = 600,
             trajectory: str = "xyz", seed: int = 0,
             depth_range=(2.0, 8.0), sprite=25) -> SyntheticSequence:
    rng = np.random.RandomState(seed)
    H, W = cam.height, cam.width
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy

    if trajectory == "xyz":
        twc = xyz_trajectory(n_frames)
    else:
        twc = forward_trajectory(n_frames)

    # landmarks spread over the viewing volume of the whole trajectory
    z = rng.uniform(*depth_range, n_points)
    u = rng.uniform(-0.2 * W, 1.2 * W, n_points)
    v = rng.uniform(-0.2 * H, 1.2 * H, n_points)
    pts = np.stack([(u - cx) / fx * z, (v - cy) / fy * z, z], -1)
    if trajectory == "forward":
        # stretch along the path
        pathlen = 0.08 * n_frames
        pts[:, 2] = rng.uniform(1.0, pathlen + depth_range[1], n_points)
        pts[:, 0] *= 3.0

    # sprites: high-contrast random block textures (strong FAST corners and
    # BRIEF-distinctive local structure — block size ~5px so a 31x31 BRIEF
    # patch sees mostly sprite, not backdrop)
    import cv2
    cell = max(sprite // 5, 2)
    small = rng.randint(0, 2, (n_points, cell + 1, cell + 1)).astype(np.float32)
    sprites = np.stack([
        cv2.resize(s, (sprite, sprite), interpolation=cv2.INTER_NEAREST)
        for s in small])
    sprites = sprites * rng.uniform(120, 220, (n_points, 1, 1)) + \
        rng.uniform(0, 30, (n_points, 1, 1))

    # backdrop: a real textured 3D plane at z = backdrop_z, rendered by
    # ray-casting each frame (a static pasted background would contribute
    # zero-motion corners and poison RANSAC)
    backdrop_z = depth_range[1] * 1.6
    tex_scale = 3  # texture covers tex_scale x the frustum at backdrop depth
    TH, TW = H * tex_scale, W * tex_scale
    g = rng.rand(TH // 8 + 2, TW // 8 + 2) * 140 + 40
    tex = cv2.resize(g.astype(np.float32), (TW, TH),
                     interpolation=cv2.INTER_NEAREST)
    tex = cv2.GaussianBlur(tex, (3, 3), 0.8)

    uu, vv = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    rays = np.stack([(uu - cx) / fx, (vv - cy) / fy, np.ones_like(uu)], -1)

    def _R_of(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])

    images = np.zeros((n_frames, H, W), np.float32)
    depths = np.zeros((n_frames, H, W), np.float32)
    r = sprite // 2
    for f in range(n_frames):
        q, t = twc[f, :4], twc[f, 4:]
        # world -> camera: Tcw = inv(Twc)
        qc = q * np.array([1, -1, -1, -1])
        pc = np.stack([_quat_rot(qc, p - t) for p in pts])
        # ray-cast the backdrop plane z = backdrop_z (world)
        Rwc = _R_of(q)
        dirs = rays @ Rwc.T                      # world-frame ray directions
        lam = (backdrop_z - t[2]) / np.maximum(dirs[..., 2], 1e-6)
        Xw = t[None, None, :] + lam[..., None] * dirs
        # texture coords: world (x, y) at backdrop depth seen from origin
        map_x = (Xw[..., 0] * fx / backdrop_z + cx + (tex_scale - 1) * W / 2
                 ).astype(np.float32)
        map_y = (Xw[..., 1] * fy / backdrop_z + cy + (tex_scale - 1) * H / 2
                 ).astype(np.float32)
        img = cv2.remap(tex, map_x, map_y, cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_WRAP)
        # camera-frame point is lam * ray (unit-z rays), so z_cam = lam
        dep = lam.astype(np.float32)
        zc = pc[:, 2]
        order = np.argsort(-zc)  # far to near
        for i in order:
            if zc[i] < 0.3:
                continue
            uu = fx * pc[i, 0] / zc[i] + cx
            vv = fy * pc[i, 1] / zc[i] + cy
            ui, vi = int(round(uu)), int(round(vv))
            if ui < r or ui >= W - r or vi < r or vi >= H - r:
                continue
            img[vi - r:vi + r + 1, ui - r:ui + r + 1] = sprites[i]
            dep[vi - r:vi + r + 1, ui - r:ui + r + 1] = zc[i]
        images[f] = img
        depths[f] = dep

    timestamps = np.arange(n_frames) / cam.fps
    return SyntheticSequence(images=images, depths=depths, poses_twc=twc,
                             timestamps=timestamps, points=pts)


def stereo_right_images(seq: SyntheticSequence, cam: CameraConfig,
                        n_points: int = None) -> np.ndarray:
    """Render right-eye images by shifting each sprite by its disparity.
    Approximate (background unshifted) — adequate for stereo matching tests."""
    bf = cam.bf
    right = np.zeros_like(seq.images)
    H, W = seq.images.shape[1:]
    for f in range(seq.images.shape[0]):
        # re-render by warping via depth: uR = u - bf/z per pixel
        z = np.maximum(seq.depths[f], 0.3)
        disp = bf / z
        u = np.arange(W)[None, :].repeat(H, 0).astype(np.float32)
        src = u + disp  # right image pixel (u) samples left at u + disp? no:
        # left pixel u maps to right pixel u - disp; build right by gather
        import cv2
        map_x = (u + disp).astype(np.float32)
        map_y = np.arange(H)[:, None].repeat(W, 1).astype(np.float32)
        right[f] = cv2.remap(seq.images[f], map_x, map_y, cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_REPLICATE)
    return right

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


def loop_trajectory(n_frames: int, radius=1.2,
                    revolutions: float = 1.0) -> np.ndarray:
    """Closed circular path with a FULL 360-degree yaw (camera follows the
    tangent, like driving a circular corridor): each pose sees only a sector
    of the room, so start and end share appearance but the middle does not —
    the disconnected-revisit structure loop closing exists for.  A loop with
    mild yaw keeps every keyframe covisible with every other in a room scene
    and the reference (correctly) never proposes candidates
    (KeyFrameDatabase.cc:96 excludes connected keyframes)."""
    poses = np.zeros((n_frames, 7))
    for i in range(n_frames):
        s = 2 * np.pi * revolutions * i / n_frames
        t = np.array([radius * np.sin(s), 0.0, radius * (1 - np.cos(s))])
        q = _quat_from_axis_angle([0, 1, 0], s)  # yaw follows the tangent
        poses[i, :4] = q / np.linalg.norm(q)
        poses[i, 4:] = t
    return poses


def _plane_texture(rng, th: int, tw: int) -> np.ndarray:
    """Smooth, ORB-friendly texture: low-frequency blobs + mid-frequency
    detail, mildly blurred — locally coherent intensity structure with
    stable intensity centroids (like real-world surfaces), unlike
    discontinuous random blocks which destabilize the IC angle for any ORB
    implementation (verified against cv2.ORB)."""
    import cv2
    g = rng.rand(th // 12 + 2, tw // 12 + 2).astype(np.float32)
    tex = cv2.resize(g, (tw, th), interpolation=cv2.INTER_CUBIC) * 150
    d = rng.rand(th // 4 + 2, tw // 4 + 2).astype(np.float32)
    tex += cv2.resize(d, (tw, th), interpolation=cv2.INTER_CUBIC) * 60
    tex = cv2.GaussianBlur(tex, (0, 0), 1.0)
    t0, t1 = tex.min(), tex.max()
    return (tex - t0) / max(t1 - t0, 1e-6) * 195.0 + 30.0


def right_poses(twc: np.ndarray, baseline: float) -> np.ndarray:
    """Right-eye Twc for a rectified stereo rig: same rotation, position
    shifted by +baseline along the camera x-axis."""
    out = twc.copy()
    for i in range(len(twc)):
        out[i, 4:] = twc[i, 4:] + _quat_rot(twc[i, :4],
                                            np.array([baseline, 0.0, 0.0]))
    return out


def generate(cam: CameraConfig, n_frames: int = 120, n_points: int = 600,
             trajectory: str = "xyz", seed: int = 0,
             depth_range=(2.0, 8.0), sprite=25,
             noise_sigma: float = 1.0,
             poses_override: np.ndarray = None,
             loop_revolutions: float = 1.0) -> SyntheticSequence:
    """Render a textured room (5 planes, ray-cast with a z-buffer).

    Local patches move coherently (each lies on one plane) so feature
    descriptors behave as on real imagery; parallax between planes provides
    the depth structure mono initialization and BA need.  `n_points` ground
    truth landmark samples are drawn on the plane surfaces for diagnostics.
    """
    import cv2
    rng = np.random.RandomState(seed)
    H, W = cam.height, cam.width
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy

    if poses_override is not None:
        twc = np.asarray(poses_override)
        assert twc.shape == (n_frames, 7)
    elif trajectory == "xyz":
        twc = xyz_trajectory(n_frames)
    elif trajectory == "loop":
        twc = loop_trajectory(n_frames, revolutions=loop_revolutions)
    else:
        twc = forward_trajectory(n_frames)

    # room planes: (point p0, normal n, u-axis, v-axis) — the camera starts
    # at the origin looking +z.  Side walls / floor / ceiling sit close
    # enough to enter the frustum, giving a broad depth mix (strong parallax
    # structure for initialization and BA).
    zf = depth_range[1]                 # back wall distance
    zn = depth_range[0]
    ex = zn * (W / 2) / fx * 1.6        # side walls enter view beyond ~zn
    ey = zn * (H / 2) / fy * 1.6
    if trajectory == "forward":
        zf = 0.1 * n_frames + depth_range[1] * 2
        ex *= 3.0
        ey *= 3.0
    planes = [
        # back wall
        (np.array([0, 0, zf]), np.array([0, 0, -1.0]),
         np.array([1.0, 0, 0]), np.array([0, 1.0, 0])),
        # floor (y = +ey in camera-ish world coords: y points down)
        (np.array([0, ey, 0]), np.array([0, -1.0, 0]),
         np.array([1.0, 0, 0]), np.array([0, 0, 1.0])),
        # ceiling
        (np.array([0, -ey, 0]), np.array([0, 1.0, 0]),
         np.array([1.0, 0, 0]), np.array([0, 0, 1.0])),
        # left wall
        (np.array([-ex, 0, 0]), np.array([1.0, 0, 0]),
         np.array([0, 0, 1.0]), np.array([0, 1.0, 0])),
        # right wall
        (np.array([ex, 0, 0]), np.array([-1.0, 0, 0]),
         np.array([0, 0, 1.0]), np.array([0, 1.0, 0])),
    ]
    # texture resolution ~ 80 px/m at the working depth
    ppm = max(fx, fy) / ((zn + zf) * 0.5) * 1.2
    texes = []
    for p0, n, ua, va in planes:
        span = 2.0 * max(ex, ey, zf)
        tw = int(np.clip(span * ppm, 256, 4096))
        texes.append((_plane_texture(rng, tw, tw), span))

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
    for f in range(n_frames):
        q, t = twc[f, :4], twc[f, 4:]
        Rwc = _R_of(q)
        dirs = rays @ Rwc.T                     # world-frame ray directions
        img = np.zeros((H, W), np.float32)
        zbuf = np.full((H, W), np.inf, np.float32)
        for (p0, n, ua, va), (tex, span) in zip(planes, texes):
            denom = dirs @ n
            lam = ((p0 - t) @ n) / np.where(np.abs(denom) > 1e-9, denom, 1e-9)
            hit = lam > 0.05
            Xw = t[None, None, :] + lam[..., None] * dirs
            tu = (Xw - p0) @ ua
            tv = (Xw - p0) @ va
            th_, tw_ = tex.shape
            map_x = ((tu / span + 0.5) * (tw_ - 1)).astype(np.float32)
            map_y = ((tv / span + 0.5) * (th_ - 1)).astype(np.float32)
            col = cv2.remap(tex, map_x, map_y, cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_WRAP)
            # z-buffer on camera depth (= lam: unit-z camera rays)
            closer = hit & (lam < zbuf)
            img = np.where(closer, col, img)
            zbuf = np.where(closer, lam, zbuf)
        if noise_sigma > 0:
            img = img + rng.randn(H, W).astype(np.float32) * noise_sigma
        images[f] = np.clip(img, 0, 255)
        depths[f] = np.where(np.isfinite(zbuf), zbuf, 0.0)

    # ground-truth landmark samples on the planes (diagnostics only): back-
    # project random pixels of frame 0 with their depth
    u = rng.uniform(5, W - 5, n_points).astype(np.float32)
    v = rng.uniform(5, H - 5, n_points).astype(np.float32)
    z0 = depths[0][v.astype(int), u.astype(int)]
    pc0 = np.stack([(u - cx) / fx * z0, (v - cy) / fy * z0, z0], -1)
    q0, t0 = twc[0, :4], twc[0, 4:]
    pts = np.stack([_quat_rot(q0, p) for p in pc0]) + t0

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

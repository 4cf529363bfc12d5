"""Augmented-reality demo support: plane detection + anchored cube render.

The TPU-native equivalent of the reference MonoAR demo
(Examples/ROS/ORB_SLAM2/src/AR/ViewerAR.cc): `DetectPlane` fits a dominant
plane to the currently tracked map points with 3-point RANSAC
(ViewerAR.cc:392-470: 50 iterations, points need >5 observations, >=50
points required) and the cube is drawn anchored to that plane
(ViewerAR.cc:187-207), recomputed whenever the map reports a big change
(`System::MapChanged`).  Rendering is headless (matplotlib overlay on the
camera frame) — the deployment target has no GL surface.
"""

from __future__ import annotations

import numpy as np


class Plane:
    """Plane through tracked map points: z=0 of `Tpw` (world -> plane)."""

    def __init__(self, normal: np.ndarray, origin: np.ndarray):
        self.n = normal / max(np.linalg.norm(normal), 1e-12)
        self.o = origin
        # build plane frame: z axis = normal (ViewerAR ExpSO3 equivalent)
        up = np.array([1.0, 0, 0]) if abs(self.n[0]) < 0.9 else \
            np.array([0, 1.0, 0])
        x = np.cross(up, self.n)
        x /= max(np.linalg.norm(x), 1e-12)
        y = np.cross(self.n, x)
        self.Rwp = np.stack([x, y, self.n], axis=1)   # plane -> world


def detect_plane(mp_pos: np.ndarray, mp_valid: np.ndarray,
                 obs_count: np.ndarray, iters: int = 50,
                 min_obs: int = 5, min_points: int = 50,
                 seed: int = 0) -> Plane | None:
    """RANSAC plane fit over well-observed tracked points (reference
    ViewerAR::DetectPlane, ViewerAR.cc:392-470: 3-point hypotheses scored by
    a robust inlier fraction; returns None when <`min_points` qualify)."""
    pts = mp_pos[mp_valid & (obs_count > min_obs)]
    n = len(pts)
    if n < min_points:
        return None
    rng = np.random.RandomState(seed)
    best_med, best = np.inf, None
    # least-median-of-squares scoring (the reference ranks hypotheses by
    # a distance quantile over the tracked points, ViewerAR.cc:429-459)
    for _ in range(iters):
        i = rng.choice(n, 3, replace=False)
        a, b, c = pts[i]
        nrm = np.cross(b - a, c - a)
        ln = np.linalg.norm(nrm)
        if ln < 1e-9:
            continue
        nrm = nrm / ln
        d = np.abs((pts - a) @ nrm)
        med = np.median(d)
        if med < best_med:
            best_med, best = med, (nrm, a)
    if best is None:
        return None
    nrm, a = best
    d = np.abs((pts - a) @ nrm)
    inl = d < max(2.5 * best_med, 1e-6)
    # refine on inliers: least-squares plane (SVD, like the reference's
    # final cv::SVD fit)
    q = pts[inl]
    o = q.mean(0)
    _, _, vt = np.linalg.svd(q - o, full_matrices=False)
    n_ref = vt[-1]
    if n_ref @ nrm < 0:
        n_ref = -n_ref
    return Plane(n_ref, o)


def cube_vertices(plane: Plane, size: float) -> np.ndarray:
    """[8, 3] world-space cube corners sitting on the plane (the reference
    draws a glutSolidCube lifted by size/2 along the plane normal,
    ViewerAR.cc:187-207)."""
    s = size / 2.0
    local = np.array([[x, y, z] for z in (0.0, size)
                      for y in (-s, s) for x in (-s, s)])
    return local @ plane.Rwp.T + plane.o


def render_ar(img: np.ndarray, Tcw: np.ndarray, K4: np.ndarray,
              plane: Plane | None, out_path: str,
              cube_size: float = 0.08, status: str = "") -> str:
    """Overlay the anchored cube on the camera frame and save to out_path.

    Tcw: [7] (wxyz quat + t) world->camera; K4: [fx, fy, cx, cy].
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    h, w = img.shape[:2]
    fig, ax = plt.subplots(figsize=(w / 100.0, h / 100.0), dpi=100)
    ax.imshow(img, cmap="gray", vmin=0, vmax=255, extent=[0, w, h, 0])
    if plane is not None:
        q, t = Tcw[:4], Tcw[4:7]
        qw, qx, qy, qz = q
        R = np.array([
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
             2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
             2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
             1 - 2 * (qx * qx + qy * qy)]])
        verts = cube_vertices(plane, cube_size) @ R.T + t
        if np.all(verts[:, 2] > 0.05):
            fx, fy, cx, cy = K4
            uv = np.stack([fx * verts[:, 0] / verts[:, 2] + cx,
                           fy * verts[:, 1] / verts[:, 2] + cy], -1)
            edges = [(0, 1), (1, 3), (3, 2), (2, 0), (4, 5), (5, 7),
                     (7, 6), (6, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
            for a, b in edges:
                ax.plot([uv[a, 0], uv[b, 0]], [uv[a, 1], uv[b, 1]],
                        c="lime", lw=1.6)
    if status:
        ax.text(4, h - 8, status, fontsize=9, color="white",
                bbox=dict(facecolor="black", alpha=0.5, pad=1.5))
    ax.set_xlim(0, w)
    ax.set_ylim(h, 0)
    ax.axis("off")
    fig.subplots_adjust(left=0, right=1, top=1, bottom=0)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


class ARSession:
    """Drive-loop helper replicating the MonoAR node's behavior: feed frames
    through SLAM, (re)detect the plane when the map changes, render the
    anchored cube (ViewerAR.cc:136-231 + MapChanged recompute 392-470)."""

    def __init__(self, slam, cube_size: float = 0.08):
        self.slam = slam
        self.plane: Plane | None = None
        self.cube_size = cube_size

    def step(self, img: np.ndarray, timestamp: float,
             out_path: str | None = None):
        from orb_slam2_tpu.map.state import point_obs_count
        self.slam.track_mono(img, timestamp)
        if self.plane is None or self.slam.map_changed():
            self.slam.flush()
            st = self.slam.state
            self.plane = detect_plane(
                np.asarray(st.mp_pos), np.asarray(st.mp_valid),
                np.asarray(point_obs_count(st)))
        if out_path is not None:
            from orb_slam2_tpu.core import camera
            self.slam.flush()
            render_ar(img, np.asarray(self.slam.ts.T),
                      np.asarray(camera.intrinsics(self.slam.cfg.camera)),
                      self.plane, out_path,
                      cube_size=self.cube_size,
                      status="SLAM" if self.slam.status == 2 else "LOST")
        return self.plane

"""MonoAR demo components (reference ViewerAR.cc:392-470 plane fit +
187-207 anchored cube)."""

import numpy as np

from orb_slam2_tpu.viz.ar import Plane, cube_vertices, detect_plane, render_ar


def _cloud_on_plane(n=200, normal=(0.1, -1.0, 0.2), d=1.5, noise=0.003,
                    outliers=40, seed=0):
    rng = np.random.RandomState(seed)
    n_vec = np.asarray(normal) / np.linalg.norm(normal)
    # basis in the plane
    up = np.array([1.0, 0, 0])
    x = np.cross(up, n_vec)
    x /= np.linalg.norm(x)
    y = np.cross(n_vec, x)
    uv = rng.uniform(-1, 1, (n, 2))
    pts = uv[:, :1] * x + uv[:, 1:] * y + d * n_vec
    pts += rng.randn(n, 3) * noise
    out = rng.uniform(-2, 2, (outliers, 3)) + d * n_vec
    return np.concatenate([pts, out]), n_vec


def test_detect_plane_finds_dominant_plane():
    pts, n_gt = _cloud_on_plane()
    M = len(pts)
    valid = np.ones(M, bool)
    obs = np.full(M, 10)
    plane = detect_plane(pts, valid, obs, seed=1)
    assert plane is not None
    cosang = abs(plane.n @ n_gt)
    assert cosang > 0.99, cosang


def test_detect_plane_needs_enough_points():
    pts, _ = _cloud_on_plane(n=20, outliers=0)
    M = len(pts)
    assert detect_plane(pts, np.ones(M, bool), np.full(M, 10),
                        min_points=50) is None
    # points with too few observations don't qualify either
    assert detect_plane(pts, np.ones(M, bool), np.full(M, 2)) is None


def test_cube_sits_on_plane_and_renders(tmp_path):
    pts, n_gt = _cloud_on_plane()
    plane = detect_plane(pts, np.ones(len(pts), bool),
                         np.full(len(pts), 10), seed=1)
    verts = cube_vertices(plane, 0.1)
    # bottom face (first 4 vertices) lies in the plane
    dist = np.abs((verts[:4] - plane.o) @ plane.n)
    assert np.all(dist < 1e-6)
    # edge length preserved
    assert abs(np.linalg.norm(verts[1] - verts[0]) - 0.1) < 1e-6
    # headless render produces a file
    img = np.full((120, 160), 128, np.float32)
    Tcw = np.array([1.0, 0, 0, 0, 0, 0, 0])
    out = render_ar(img, Tcw, np.array([100.0, 100.0, 80.0, 60.0]), plane,
                    str(tmp_path / "ar.png"), status="SLAM")
    import os
    assert os.path.getsize(out) > 0

"""FAST-9/16 corner detection as dense vectorized array ops.

Replaces the reference's per-cell calls to cv::FAST
(ORBextractor::ComputeKeyPointsOctTree, ORBextractor.cc:765-853).  Instead of
scalar pixel loops, the segment test runs on whole images: the 16 Bresenham
circle samples become 16 shifted views of the image, the contiguous-arc test
becomes rolled boolean ANDs, and the corner score is the exact "maximum
threshold that keeps the corner" (what cv::FAST's cornerScore computes),
obtained in closed form as max over arcs of the min arc difference.

Everything is dense [H, W] math on the VPU — ideal for TPU; no dynamic
shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3: 16 (dy, dx) offsets in clockwise order
# starting from (-3, 0) (top).  Order only matters for contiguity.
CIRCLE = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
], dtype=np.int32)
ARC_LEN = 9  # FAST-9


def _shifted(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """View of img shifted so result[y, x] = img[y+dy, x+dx] (zero border)."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))


def fast_score_map(img: jnp.ndarray, border: int = 3) -> jnp.ndarray:
    """Return [H, W] corner score: the largest threshold t for which the
    pixel passes the FAST-9 segment test (0 where never a corner at t>=1).

    score = max(max_r min_{k<9}(circle - Ip), max_r min_{k<9}(Ip - circle))
    evaluated over all 16 rotations r.
    """
    ip = img
    diffs = jnp.stack([_shifted(img, int(dy), int(dx)) - ip
                       for dy, dx in CIRCLE], axis=0)  # [16, H, W]

    def arc_min(d):
        # min over ARC_LEN consecutive circle positions, for each rotation:
        # acc_r = min(d[r], d[r+1], ..., d[r+8]); then best rotation.
        acc = d
        for k in range(1, ARC_LEN):
            acc = jnp.minimum(acc, jnp.roll(d, -k, axis=0))
        return jnp.max(acc, axis=0)

    bright = arc_min(diffs)          # > t for a bright corner
    dark = arc_min(-diffs)           # > t for a dark corner
    score = jnp.maximum(bright, dark)
    score = jnp.maximum(score, 0.0)
    # zero the border where circle samples wrap around
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = ((ys >= border) & (ys < h - border) &
              (xs >= border) & (xs < w - border))
    return jnp.where(inside, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression (cv::FAST nonmaxSuppression=true)."""
    neigh = [jnp.roll(score, (dy, dx), axis=(0, 1))
             for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
    m = score
    for n in neigh:
        m = jnp.maximum(m, n)
    return jnp.where(score >= m, score, 0.0)


def cell_threshold(score: jnp.ndarray, cell: int, ini_th: float,
                   min_th: float) -> jnp.ndarray:
    """Dual-threshold per cell: keep scores > ini_th; in cells where nothing
    passes ini_th, fall back to min_th (reference ORBextractor.cc:809-816).

    `cell` is the cell size in pixels (30 in the reference).
    """
    h, w = score.shape
    cy = jnp.arange(h) // cell
    cx = jnp.arange(w) // cell
    n_cy = int(np.ceil(h / cell))
    n_cx = int(np.ceil(w / cell))
    cell_id = cy[:, None] * n_cx + cx[None, :]
    cell_max = jax.ops.segment_max(score.reshape(-1), cell_id.reshape(-1),
                                   num_segments=n_cy * n_cx)
    has_strong = (cell_max > ini_th)[cell_id]
    th = jnp.where(has_strong, ini_th, min_th)
    return jnp.where(score > th, score, 0.0)

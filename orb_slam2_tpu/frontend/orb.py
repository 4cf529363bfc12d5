"""ORB orientation + rotated-BRIEF descriptors, batched over keypoints.

Covers the behavior of reference `IC_Angle` (ORBextractor.cc:77-104) and
`computeOrbDescriptor` (ORBextractor.cc:108-147): intensity-centroid
orientation over a radius-15 circular patch, then a 256-bit binary descriptor
from rotated point-pair intensity comparisons.

Instead of the reference's hand-tuned learned pattern table
(`bit_pattern_31_`), we generate our own deterministic pattern: i.i.d.
Gaussian point pairs (sigma = patch/5, the classic BRIEF recipe) rejected to
radius <= 13 so every rotated sample stays inside the 31x31 patch.  Descriptor
*bytes* are therefore not interchangeable with the reference's, but nothing
requires that: the vocabulary is trained on our own descriptors.

TPU mapping: one gather per keypoint pulls the whole 31x31 patch; orientation
moments and all 512 descriptor samples are then VPU math + tiny in-patch
gathers, vmapped over keypoints.  Descriptors are returned both bit-packed
(uint8 [K, 32]) and as +-1 float rows for MXU matmul matching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 31
HALF = 15
N_BITS = 256
_PATTERN_RADIUS = 13.0
_PATTERN_SEED = 20260817


def _make_pattern() -> np.ndarray:
    """[256, 2, 2] int32 (pair, point, (dy, dx)) test pattern.

    Preferred source: `data/brief_pattern.npy`, learned offline by
    scripts/train_pattern.py with the ORB paper's greedy
    variance/decorrelation selection over a keypoint-patch corpus (the
    procedure behind the reference's `bit_pattern_31_` table,
    ORBextractor.cc:150-407 — our own corpus and code, not their table).
    Fallback when absent: deterministic i.i.d. Gaussian pairs (classic
    BRIEF recipe), noticeably weaker across revisit viewpoint change."""
    import os
    learned = os.path.join(os.path.dirname(__file__), "..", "data",
                           "brief_pattern.npy")
    if os.path.exists(learned):
        pat = np.load(learned).astype(np.int32)
        assert pat.shape == (N_BITS, 2, 2), pat.shape
        assert np.abs(pat).max() <= _PATTERN_RADIUS
        return pat
    rng = np.random.RandomState(_PATTERN_SEED)
    pts = []
    sigma = PATCH / 5.0
    while len(pts) < N_BITS * 2:
        p = rng.randn(2) * sigma
        if np.hypot(*p) <= _PATTERN_RADIUS:
            pts.append(np.round(p))
    pat = np.asarray(pts[:N_BITS * 2], dtype=np.int32).reshape(N_BITS, 2, 2)
    return pat


PATTERN = _make_pattern()  # (dy, dx) integer offsets

# circular-patch row extents for IC_Angle: u_max[v] = half-width of row v
# (reference precomputes umax via the circle eq, ORBextractor.cc:452-469)
_V = np.arange(-HALF, HALF + 1)
_UMAX_ROW = np.floor(np.sqrt(np.maximum(HALF * HALF - _V * _V, 0)) + 0.5).astype(np.int32)


def circular_mask() -> np.ndarray:
    """[31, 31] bool mask of the radius-15 circular patch."""
    yy, xx = np.meshgrid(_V, _V, indexing='ij')
    return (np.abs(xx) <= _UMAX_ROW[yy + HALF]).astype(np.float32)


_MASK = circular_mask()
_YY, _XX = np.meshgrid(_V, _V, indexing='ij')


def gather_patches(img: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Gather 31x31 patches around integer keypoint coords.

    img: [H, W]; pts: [K, 2] float (x, y) in this level's coords.
    Returns [K, 31, 31].  Coords are clamped to valid range (callers mask out
    border keypoints anyway via the extraction border).
    """
    h, w = img.shape
    cy = jnp.clip(jnp.round(pts[:, 1]).astype(jnp.int32), HALF, h - HALF - 1)
    cx = jnp.clip(jnp.round(pts[:, 0]).astype(jnp.int32), HALF, w - HALF - 1)
    ys = cy[:, None, None] + jnp.asarray(_YY)[None]
    xs = cx[:, None, None] + jnp.asarray(_XX)[None]
    return img[ys, xs]


def ic_angle(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle per patch [K, 31, 31] -> radians [K]."""
    mask = jnp.asarray(_MASK)
    m10 = jnp.sum(patches * mask * jnp.asarray(_XX, jnp.float32), axis=(1, 2))
    m01 = jnp.sum(patches * mask * jnp.asarray(_YY, jnp.float32), axis=(1, 2))
    return jnp.arctan2(m01, m10)


def brief_descriptors(patches: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotated BRIEF: [K, 31, 31] patches + [K] angles -> bits [K, 256] bool.

    Like the reference (ORBextractor.cc:108-147) the *pattern* is rotated by
    the keypoint angle and sampled at nearest-integer offsets.
    """
    ca, sa = jnp.cos(angles), jnp.sin(angles)          # [K]
    pat = jnp.asarray(PATTERN, jnp.float32)            # [256, 2, 2] (dy, dx)
    dy = pat[..., 0][None]                             # [1, 256, 2]
    dx = pat[..., 1][None]
    # rotate: x' = x cos - y sin ; y' = x sin + y cos  (image coords)
    rx = jnp.round(dx * ca[:, None, None] - dy * sa[:, None, None]).astype(jnp.int32)
    ry = jnp.round(dx * sa[:, None, None] + dy * ca[:, None, None]).astype(jnp.int32)
    iy = jnp.clip(ry + HALF, 0, PATCH - 1)
    ix = jnp.clip(rx + HALF, 0, PATCH - 1)
    flat = patches.reshape(patches.shape[0], -1)       # [K, 961]
    idx = (iy * PATCH + ix).reshape(patches.shape[0], -1)  # [K, 512]
    samples = jnp.take_along_axis(flat, idx, axis=-1).reshape(-1, N_BITS, 2)
    return samples[..., 0] < samples[..., 1]           # bit = I(p1) < I(p2)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[K, 256] bool -> [K, 32] uint8 (little-endian bit order per byte)."""
    b = bits.reshape(bits.shape[0], 32, 8).astype(jnp.uint8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """[K, 32] uint8 -> [K, 256] bool."""
    shifts = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7], jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1
    return bits.reshape(packed.shape[0], 256).astype(jnp.bool_)


def bits_to_pm1(bits: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[K, 256] bool -> +-1 rows for Hamming-as-matmul on the MXU."""
    return jnp.where(bits, 1.0, -1.0).astype(dtype)

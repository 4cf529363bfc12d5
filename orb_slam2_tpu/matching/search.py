"""Dense masked matchers: the TPU equivalents of the reference's 9
`ORBmatcher::Search*` entry points (ORBmatcher.h:48-83).

Every matcher follows one shape: build a gate mask [A, B] (spatial window /
octave band / epipolar distance), add it to the dense Hamming matrix as +inf,
take best & second-best per row, apply distance threshold + Lowe ratio +
rotation-histogram consistency, and resolve duplicate column assignments by
keeping the smallest distance.  No grids, no buckets: masks over one matmul.

Matches are returned as `idx_b [A] int32` (-1 = unmatched), mirroring the
reference's `vnMatches12` convention (ORBmatcher.cc:405-520).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

INF = jnp.float32(1e9)


class MatchResult(NamedTuple):
    idx: jnp.ndarray    # [A] int32 index into B, -1 if unmatched
    dist: jnp.ndarray   # [A] int32 Hamming distance (meaningless where idx<0)

    @property
    def n(self):
        return jnp.sum((self.idx >= 0).astype(jnp.int32))


def _best_two(masked_dist: jnp.ndarray):
    """Per-row smallest and second-smallest over [A, B] float matrix."""
    best = jnp.min(masked_dist, axis=1)
    best_idx = jnp.argmin(masked_dist, axis=1)
    without = jnp.where(
        jax.nn.one_hot(best_idx, masked_dist.shape[1], dtype=jnp.bool_),
        INF, masked_dist)
    second = jnp.min(without, axis=1)
    return best, best_idx, second


def resolve_duplicates(idx: jnp.ndarray, dist: jnp.ndarray,
                       n_cols: int) -> jnp.ndarray:
    """Keep only the lowest-distance row per claimed column (the reference's
    mutual-exclusion bookkeeping, ORBmatcher.cc:463-470).  Returns idx with
    losers set to -1."""
    big = jnp.float32(1e9)
    n_rows = idx.shape[0]
    claimed = jnp.where(idx >= 0, idx, 0)
    col_min = jnp.full((n_cols,), big).at[claimed].min(
        jnp.where(idx >= 0, dist.astype(jnp.float32), big))
    keep = (idx >= 0) & (dist.astype(jnp.float32) <= col_min[claimed])
    # among equal-distance ties keep the first row
    order = jnp.arange(n_rows)
    first_row = jnp.full((n_cols,), n_rows + 1).at[claimed].min(
        jnp.where(keep, order, n_rows + 1))
    keep = keep & (order == first_row[claimed])
    return jnp.where(keep, idx, -1)


def rotation_consistency(angle_a: jnp.ndarray, angle_b: jnp.ndarray,
                         idx: jnp.ndarray, histo_length: int = 30) -> jnp.ndarray:
    """Keep only matches whose angle difference falls in the 3 most popular
    of `histo_length` bins (reference ComputeThreeMaxima + filter,
    ORBmatcher.cc:1601-1642, applied at :267-285).

    Like the reference, bins whose count is below 0.1x the max bin are not
    protected even if in the top 3 (ORBmatcher.cc:1630-1640).
    """
    matched = idx >= 0
    rot = angle_a - angle_b[jnp.clip(idx, 0, None)]
    deg = jnp.rad2deg(rot) % 360.0
    bin_f = deg * histo_length / 360.0
    bins = jnp.clip(bin_f.astype(jnp.int32), 0, histo_length - 1)
    counts = jnp.zeros((histo_length,), jnp.int32).at[bins].add(
        matched.astype(jnp.int32))
    top3 = jax.lax.top_k(counts, 3)[0]
    keep_bin = (counts[:, None] == top3[None, :]).any(axis=1)
    keep_bin = keep_bin & (counts > 0.1 * top3[0])
    return jnp.where(matched & keep_bin[bins], idx, -1)


def match_descriptors(
    dist: jnp.ndarray,
    gate: jnp.ndarray,
    max_dist: float,
    ratio: Optional[float],
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
) -> MatchResult:
    """Generic gated best-match with optional Lowe ratio test.

    dist: [A, B] int Hamming; gate: [A, B] bool allowed pairs.
    """
    allowed = gate & valid_a[:, None] & valid_b[None, :]
    md = jnp.where(allowed, dist.astype(jnp.float32), INF)
    best, best_idx, second = _best_two(md)
    ok = best <= max_dist
    if ratio is not None:
        ok = ok & (best < ratio * jnp.minimum(second, INF - 1))
    idx = jnp.where(ok, best_idx, -1)
    idx = resolve_duplicates(idx, best.astype(jnp.int32), dist.shape[1])
    return MatchResult(idx=idx, dist=best.astype(jnp.int32))


def window_gate(uv_a: jnp.ndarray, uv_b: jnp.ndarray, radius) -> jnp.ndarray:
    """[A, B] mask: |u| and |v| difference within radius.  `radius` may be a
    scalar or per-row [A] array (scale-dependent windows)."""
    du = jnp.abs(uv_a[:, None, 0] - uv_b[None, :, 0])
    dv = jnp.abs(uv_a[:, None, 1] - uv_b[None, :, 1])
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    return (du <= r) & (dv <= r)


def octave_gate(oct_a_pred: jnp.ndarray, oct_b: jnp.ndarray,
                lo_off: int, hi_off: int) -> jnp.ndarray:
    """[A, B] mask: keypoint octave within [pred+lo_off, pred+hi_off]
    (the reference's per-entry-point level windows, e.g. ORBmatcher.cc:90-96
    searches [pred-1, pred+1] for tracking)."""
    o = oct_b[None, :]
    p = oct_a_pred[:, None]
    return (o >= p + lo_off) & (o <= p + hi_off)


def search_for_initialization(feat1_uv, feat1_desc, feat1_angle, feat1_oct,
                              feat1_valid, feat2_uv, feat2_desc, feat2_angle,
                              feat2_oct, feat2_valid, window: float,
                              max_dist: float, ratio: float,
                              check_rotation: bool = True) -> MatchResult:
    """Mono-init matcher (reference SearchForInitialization,
    ORBmatcher.cc:405-520): spatial window around the same location,
    threshold + ratio + rotation filter.

    Deviation: the reference restricts to level-0 keypoints (ORBmatcher.cc:
    422-423) and compensates with a dedicated 2x-feature extractor for init
    frames (Tracking.cc:108).  Here all pyramid levels participate with an
    octave-equality gate — the dense matcher prices extra rows at zero, and
    the multi-level pool yields ~4x the tentative matches of level 0 alone
    (the batched RANSAC absorbs the added scale-localization noise)."""
    from orb_slam2_tpu.matching.hamming import hamming_matrix
    dist = hamming_matrix(feat1_desc, feat2_desc)
    gate = window_gate(feat1_uv, feat2_uv, window)
    gate = gate & (feat1_oct[:, None] == feat2_oct[None, :])
    res = match_descriptors(dist, gate, max_dist, ratio, feat1_valid, feat2_valid)
    idx = res.idx
    if check_rotation:
        idx = rotation_consistency(feat1_angle, feat2_angle, idx)
    return MatchResult(idx=idx, dist=res.dist)


def search_by_projection(pred_uv, pred_octave, pt_desc, pt_valid,
                         kp_uv, kp_oct, kp_desc, kp_angle, kp_valid,
                         radius_per_pt, max_dist: float, ratio: Optional[float],
                         oct_lo: int = -1, oct_hi: int = 1) -> MatchResult:
    """Project-and-match (reference SearchByProjection family,
    ORBmatcher.cc:45-129 and 1328-1470): window radius scaled by predicted
    octave, octave band gate, threshold + optional ratio."""
    from orb_slam2_tpu.matching.hamming import hamming_matrix
    dist = hamming_matrix(pt_desc, kp_desc)
    gate = window_gate(pred_uv, kp_uv, radius_per_pt)
    gate = gate & octave_gate(pred_octave, kp_oct, oct_lo, oct_hi)
    return match_descriptors(dist, gate, max_dist, ratio, pt_valid, kp_valid)

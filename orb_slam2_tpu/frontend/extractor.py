"""ORB pyramid extractor: the TPU replacement of `ORBextractor::operator()`
(reference ORBextractor.cc:1043-1105).

Pipeline per level (all fixed-shape):
  raw level -> FAST score map -> 3x3 NMS -> dual-threshold per 30px cell ->
  spatially-balanced top-k selection -> IC orientation + rotated BRIEF on the
  blurred level -> coords scaled to level 0.

The reference's octree redistribution (`DistributeOctTree`,
ORBextractor.cc:539-763) keeps the max-response keypoint per spatial region
until ~N regions exist.  The fixed-shape equivalent here: each level gets a
selection grid with about as many cells as its keypoint quota; cell-winners
get a large priority bonus, then one `top_k` picks cell-winners first (spatial
spread) and fills the remaining quota with the globally best leftovers.
"""

from __future__ import annotations

import functools
import math
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import ORBConfig
from orb_slam2_tpu.frontend import fast, orb, pyramid


class Features(NamedTuple):
    """Fixed-capacity keypoint set for one image (pytree)."""
    uv: jnp.ndarray        # [K, 2] float32, level-0 pixel coords (x, y), raw
    response: jnp.ndarray  # [K] float32 FAST score
    octave: jnp.ndarray    # [K] int32 pyramid level
    angle: jnp.ndarray     # [K] float32 radians
    desc: jnp.ndarray      # [K, 32] uint8 packed 256-bit descriptors
    valid: jnp.ndarray     # [K] bool

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def per_level_quota(n_features: int, n_levels: int, scale: float) -> List[int]:
    """Geometric split of the keypoint budget over levels (reference
    ORBextractor ctor, ORBextractor.cc:437-450)."""
    inv = 1.0 / scale
    first = n_features * (1 - inv) / (1 - inv ** n_levels)
    quotas = [int(round(first * inv ** i)) for i in range(n_levels - 1)]
    quotas.append(max(n_features - sum(quotas), 0))
    return quotas


def _select_level(score: jnp.ndarray, quota: int, border: int,
                  n_grid: int) -> tuple:
    """Pick `quota` keypoints from a score map, spatially balanced.

    Returns (xy [quota, 2] float32 level coords, resp [quota], valid [quota]).
    """
    h, w = score.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = ((ys >= border) & (ys < h - border) &
              (xs >= border) & (xs < w - border))
    score = jnp.where(inside, score, 0.0)

    # selection grid ~ quota cells
    gy = max(int(round(math.sqrt(n_grid * h / max(w, 1)))), 1)
    gx = max((n_grid + gy - 1) // gy, 1)
    cell_y = jnp.clip(ys * gy // h, 0, gy - 1)
    cell_x = jnp.clip(xs * gx // w, 0, gx - 1)
    cell_id = (cell_y + jnp.zeros_like(cell_x)) * gx + cell_x
    flat_score = score.reshape(-1)
    flat_cell = cell_id.reshape(-1)
    cell_max = jax.ops.segment_max(flat_score, flat_cell, num_segments=gy * gx)
    is_winner = (flat_score > 0) & (flat_score >= cell_max[flat_cell])
    bonus = jnp.float32(1e6)
    priority = jnp.where(flat_score > 0, flat_score + is_winner * bonus, -1.0)

    top, idx = jax.lax.top_k(priority, quota)
    valid = top > 0
    yx = jnp.stack([idx // w, idx % w], axis=-1)
    xy = jnp.stack([yx[:, 1], yx[:, 0]], axis=-1).astype(jnp.float32)
    resp = jnp.take(flat_score, idx)
    return xy, resp, valid


def build_extractor(cfg: ORBConfig, height: int, width: int,
                    use_pallas: bool | None = None, n_images: int = 1,
                    **kwargs):
    """Return a jittable `extract(img [H, W] float32) -> Features` closure
    for a fixed image size (the atlas formulation, frontend/atlas.py — op
    count independent of level count; `n_images=2` batches stereo L/R).

    `use_pallas=None` auto-selects the fused Pallas FAST+NMS kernel
    (frontend/pallas_fast.py) on TPU backends and the jnp reference path
    elsewhere; both are bit-equivalent (tests/test_pallas.py)."""
    from orb_slam2_tpu.frontend.atlas import build_atlas_extractor
    return build_atlas_extractor(cfg, height, width, n_images=n_images,
                                 use_pallas=use_pallas, **kwargs)


def build_extractor_perlevel(cfg: ORBConfig, height: int, width: int,
                             use_pallas: bool | None = None):
    """The round-4 per-level formulation (one ~50-op chain per pyramid
    level).  Kept for A/B comparison; `build_extractor` (atlas) is the
    production path."""
    quotas = per_level_quota(cfg.n_features, cfg.n_levels, cfg.scale_factor)
    shapes = pyramid.level_shapes(height, width, cfg.n_levels, cfg.scale_factor)
    total = sum(quotas)
    pad = cfg.max_keypoints - total
    if pad < 0:
        raise ValueError(f"max_keypoints {cfg.max_keypoints} < quota sum {total}")
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def extract(img: jnp.ndarray) -> Features:
        levels = pyramid.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        uv_all, resp_all, oct_all, ang_all, desc_all, valid_all = [], [], [], [], [], []
        for lvl, (quota, lv_img) in enumerate(zip(quotas, levels)):
            if quota == 0:
                continue
            if use_pallas:
                from orb_slam2_tpu.frontend.pallas_fast import fast_nms_pallas
                smap = fast_nms_pallas(lv_img, interpret=False)
            else:
                smap = fast.nms3x3(fast.fast_score_map(lv_img))
            smap = fast.cell_threshold(smap, cfg.cell_size,
                                       float(cfg.ini_th_fast), float(cfg.min_th_fast))
            xy, resp, valid = _select_level(
                smap, quota, border=cfg.edge_threshold - 3, n_grid=quota)
            blurred = pyramid.gaussian_blur(lv_img, cfg.blur_ksize,
                                            cfg.blur_sigma)
            patches = orb.gather_patches(blurred, xy)
            ang = orb.ic_angle(patches)
            bits = orb.brief_descriptors(patches, ang)
            desc = orb.pack_bits(bits)
            scale = cfg.scale_factor ** lvl
            uv_all.append(xy * scale)
            resp_all.append(resp)
            oct_all.append(jnp.full((quota,), lvl, jnp.int32))
            ang_all.append(ang)
            desc_all.append(desc)
            valid_all.append(valid)

        uv = jnp.concatenate(uv_all, 0)
        resp = jnp.concatenate(resp_all, 0)
        octv = jnp.concatenate(oct_all, 0)
        ang = jnp.concatenate(ang_all, 0)
        desc = jnp.concatenate(desc_all, 0)
        valid = jnp.concatenate(valid_all, 0)
        if pad:
            uv = jnp.pad(uv, ((0, pad), (0, 0)))
            resp = jnp.pad(resp, (0, pad))
            octv = jnp.pad(octv, (0, pad))
            ang = jnp.pad(ang, (0, pad))
            desc = jnp.pad(desc, ((0, pad), (0, 0)))
            valid = jnp.pad(valid, (0, pad))
        return Features(uv=uv, response=resp, octave=octv, angle=ang,
                        desc=desc, valid=valid)

    return extract

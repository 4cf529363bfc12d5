"""Frame construction: features + undistortion + depth/stereo association.

The TPU equivalent of the reference `Frame` constructors (Frame.cc:61-228):
extraction, keypoint undistortion (Frame.cc:404-434), RGB-D depth-to-virtual-
right-coordinate (Frame.cc:643-664) and stereo left/right matching
(Frame.cc:466-640).  No 64x48 occupancy grid is built — the dense matchers
gate by pixel distance directly (see matching/search.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orb_slam2_tpu.config import SLAMConfig
from orb_slam2_tpu.core import camera
from orb_slam2_tpu.frontend import Features, build_extractor
from orb_slam2_tpu.matching import hamming, search


class Frame(NamedTuple):
    uv: jnp.ndarray       # [N, 2] undistorted keypoint coords
    uv_raw: jnp.ndarray   # [N, 2] raw coords (for drawing)
    ur: jnp.ndarray       # [N] stereo/virtual right u (-1 = none)
    depth: jnp.ndarray    # [N] depth (-1 = none)
    octave: jnp.ndarray   # [N] i32
    angle: jnp.ndarray    # [N]
    desc: jnp.ndarray     # [N, 32] u8
    valid: jnp.ndarray    # [N] bool
    frame_id: jnp.ndarray  # i32
    timestamp: jnp.ndarray  # f32

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def _finish(cfg: SLAMConfig, feats: Features, ur, depth, frame_id, timestamp):
    K = camera.intrinsics(cfg.camera)
    d = camera.distortion(cfg.camera)
    uv = camera.undistort_points(K, d, feats.uv)
    return Frame(uv=uv, uv_raw=feats.uv, ur=ur, depth=depth,
                 octave=feats.octave, angle=feats.angle, desc=feats.desc,
                 valid=feats.valid,
                 frame_id=jnp.asarray(frame_id, jnp.int32),
                 timestamp=jnp.asarray(timestamp, jnp.float32))


def build_mono_frame_fn(cfg: SLAMConfig):
    """Returns jittable (image [H,W] f32, frame_id, timestamp) -> Frame."""
    extract = build_extractor(cfg.orb, cfg.camera.height, cfg.camera.width)

    def fn(img, frame_id, timestamp):
        feats = extract(img)
        n = feats.uv.shape[0]
        return _finish(cfg, feats, jnp.full((n,), -1.0), jnp.full((n,), -1.0),
                       frame_id, timestamp)

    return fn


def build_rgbd_frame_fn(cfg: SLAMConfig):
    """RGB-D: sample the registered depth map at keypoint locations
    (reference Frame.cc:643-664; depth already divided by DepthMapFactor)."""
    extract = build_extractor(cfg.orb, cfg.camera.height, cfg.camera.width)
    K = camera.intrinsics(cfg.camera)
    bf = cfg.camera.bf

    def fn(img, depth_map, frame_id, timestamp):
        feats = extract(img)
        xi = jnp.clip(jnp.round(feats.uv[:, 0]).astype(jnp.int32), 0,
                      depth_map.shape[1] - 1)
        yi = jnp.clip(jnp.round(feats.uv[:, 1]).astype(jnp.int32), 0,
                      depth_map.shape[0] - 1)
        d = depth_map[yi, xi]
        has = (d > 0) & feats.valid
        # virtual right coordinate from *undistorted* u (like the reference,
        # which undistorts first)
        Kc = camera.intrinsics(cfg.camera)
        dc = camera.distortion(cfg.camera)
        uv_und = camera.undistort_points(Kc, dc, feats.uv)
        ur = jnp.where(has, camera.stereo_right_u(K, bf, uv_und, d), -1.0)
        depth = jnp.where(has, d, -1.0)
        return _finish(cfg, feats, ur, depth, frame_id, timestamp)

    return fn


def _sad_subpixel_atlas(atlas, lvl_h, lvl_w, n_levels, uv_l, ur0, octave,
                        matched, scale_factors, w: int = 5, slide: int = 5):
    """Sliding SAD + parabola subpixel on the keypoint's own pyramid level
    (reference Frame::ComputeStereoMatches, Frame.cc:552-608: windows come
    from mvImagePyramid[kpL.octave] at integer level coords).

    atlas: [2*L, Hp, Wp] raw padded level stack (left images then right).
    ONE [11, 11] slice gather fetches the left window and ONE [11, 21]
    slice gather the right candidate band; the 11 displacement windows are
    then static slices of the band — the per-displacement gather loop of
    the level-0 formulation cost ~12 ms/frame.
    Returns (ur_refined level-0 coords [N], sad_best [N]).
    """
    G, Hp, Wp = atlas.shape
    N = uv_l.shape[0]
    L = n_levels
    s = scale_factors[octave]                       # [N]
    xl = jnp.round(uv_l[:, 0] / s).astype(jnp.int32)
    yl = jnp.round(uv_l[:, 1] / s).astype(jnp.int32)
    xr_i = jnp.round(ur0 / s).astype(jnp.int32)
    hs = lvl_h[octave]
    ws = lvl_w[octave]
    yl = jnp.clip(yl, w, hs - w - 1)
    xl = jnp.clip(xl, w, ws - w - 1)
    xr_i = jnp.clip(xr_i, w + slide, ws - w - slide - 1)

    flat = atlas.reshape(G * Hp, Wp)
    W2 = 2 * w + 1
    B2 = W2 + 2 * slide

    def slice_gather(g_idx, y0, x0, rows, cols):
        starts = jnp.stack([g_idx * Hp + y0, x0], -1)
        return jax.lax.gather(
            flat, starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(rows, cols))

    wl = slice_gather(octave, yl - w, xl - w, W2, W2)          # [N, 11, 11]
    bandr = slice_gather(octave + L, yl - w, xr_i - w - slide,
                         W2, B2)                               # [N, 11, 21]
    wl = wl - wl[:, w:w + 1, w:w + 1]               # center-normalize (:557)
    sads = []
    for r in range(2 * slide + 1):
        wr = bandr[:, :, r:r + W2]
        wr = wr - wr[:, w:w + 1, w:w + 1]
        sads.append(jnp.sum(jnp.abs(wl - wr), axis=(1, 2)))
    sads = jnp.stack(sads, 1)                       # [N, 11]
    best = jnp.argmin(sads, axis=1)
    interior = (best > 0) & (best < 2 * slide)
    bi = jnp.clip(best, 1, 2 * slide - 1)
    idx = jnp.arange(N)
    sm1, s0, sp1 = sads[idx, bi - 1], sads[idx, bi], sads[idx, bi + 1]
    denom = sm1 - 2.0 * s0 + sp1
    delta = 0.5 * (sm1 - sp1) / jnp.where(jnp.abs(denom) > 1e-6, denom, 1e-6)
    delta = jnp.clip(delta, -1.0, 1.0)
    xr_ref = (xr_i.astype(jnp.float32) +
              (bi.astype(jnp.float32) - slide) + delta) * s
    ur_ref = jnp.where(matched & interior, xr_ref, ur0)
    return ur_ref, jnp.where(matched, s0, jnp.inf)


def build_stereo_frame_fn(cfg: SLAMConfig):
    """Stereo: extract on both images, match left-right within row bands and
    the valid disparity range (best Hamming candidate), then refine the
    disparity with a +-5 sliding SAD window + parabola subpixel fit and cut
    outliers at 1.5*1.4*median SAD (reference Frame::ComputeStereoMatches,
    Frame.cc:466-640)."""
    # L/R extraction batched into ONE program (the reference runs two
    # std::threads, Frame.cc:78-81; the atlas extractor's op count is
    # independent of the image count, so the pair costs ~1.5x one image)
    extract2 = build_extractor(cfg.orb, cfg.camera.height, cfg.camera.width,
                               n_images=2, return_atlas=True)
    K = camera.intrinsics(cfg.camera)
    bf = cfg.camera.bf
    scale_factors = jnp.asarray(cfg.orb.scale_factors, jnp.float32)
    from orb_slam2_tpu.frontend import pyramid as _pyr
    shapes = _pyr.level_shapes(cfg.camera.height, cfg.camera.width,
                               cfg.orb.n_levels, cfg.orb.scale_factor)
    lvl_h = jnp.asarray([s[0] for s in shapes], jnp.int32)
    lvl_w = jnp.asarray([s[1] for s in shapes], jnp.int32)

    def fn(img_l, img_r, frame_id, timestamp):
        both, atlas = extract2(jnp.stack([img_l, img_r]))
        fl = jax.tree.map(lambda a: a[0], both)
        fr = jax.tree.map(lambda a: a[1], both)
        # row band: |vL - vR| <= 2 * scale of left octave (Frame.cc:475-493)
        r_l = scale_factors[fl.octave]
        dv = jnp.abs(fl.uv[:, None, 1] - fr.uv[None, :, 1])
        band = dv <= 2.0 * r_l[:, None]
        # disparity range [minD, maxD] = [0, bf/baseline] => uR in
        # [uL - maxD, uL] (Frame.cc:495-498)
        disp = fl.uv[:, None, 0] - fr.uv[None, :, 0]
        max_d = bf / max(cfg.camera.baseline, 1e-6)
        drange = (disp >= 0.1) & (disp <= max_d)
        # octave agreement +-1
        oct_ok = jnp.abs(fl.octave[:, None] - fr.octave[None, :]) <= 1
        gate = band & drange & oct_ok
        dist = hamming.hamming_matrix(fl.desc, fr.desc)
        res = search.match_descriptors(
            dist, gate, max_dist=cfg.match.th_high, ratio=None,
            valid_a=fl.valid, valid_b=fr.valid)
        matched = res.idx >= 0
        ur0 = jnp.where(matched, fr.uv[jnp.clip(res.idx, 0, None), 0], -1.0)

        ur, sad = _sad_subpixel_atlas(atlas, lvl_h, lvl_w, cfg.orb.n_levels,
                                      fl.uv, ur0, fl.octave, matched,
                                      scale_factors)
        # median SAD outlier cut (Frame.cc:626-639)
        n_m = jnp.maximum(jnp.sum(matched.astype(jnp.int32)), 1)
        sad_sorted = jnp.sort(jnp.where(matched, sad, jnp.inf))
        med = sad_sorted[jnp.clip((n_m - 1) // 2, 0, sad.shape[0] - 1)]
        keep = matched & (sad <= 1.5 * 1.4 * med)

        disp_m = jnp.clip(fl.uv[:, 0] - ur, 0.01, max_d)
        depth = jnp.where(keep, bf / disp_m, -1.0)
        n = fl.uv.shape[0]
        return _finish(cfg, fl, jnp.where(keep, ur, jnp.full((n,), -1.0)),
                       depth, frame_id, timestamp)

    return fn

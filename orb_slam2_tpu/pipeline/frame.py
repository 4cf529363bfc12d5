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


def _sad_subpixel(img_l, img_r, uv_l, ur0, octave, matched, scale_factors,
                  w: int = 5, slide: int = 5):
    """Sliding-window SAD disparity refinement + parabola subpixel fit
    (reference Frame::ComputeStereoMatches, Frame.cc:552-608).

    The reference runs the (2w+1)^2 SAD at the keypoint's pyramid level; here
    the windows are sampled from the level-0 images with the window *stride*
    scaled by the keypoint's level (same spatial support, no per-level image
    plumbing).  Returns (ur_refined [N], sad_best [N]).
    """
    H, W = img_l.shape
    N = uv_l.shape[0]
    s = scale_factors[octave]                      # [N]
    d = jnp.arange(-w, w + 1, dtype=jnp.float32)
    # [N, 11, 11] sample offsets scaled per keypoint
    oy = d[None, :, None] * s[:, None, None]
    ox = d[None, None, :] * s[:, None, None]

    def window(img, cx, cy):
        ys = jnp.clip(jnp.round(cy[:, None, None] + oy).astype(jnp.int32),
                      0, H - 1)
        xs = jnp.clip(jnp.round(cx[:, None, None] + ox).astype(jnp.int32),
                      0, W - 1)
        return img[ys, xs]

    wl = window(img_l, uv_l[:, 0], uv_l[:, 1])
    wl = wl - wl[:, w:w + 1, w:w + 1]              # center-normalize (:557)

    def sad_at(r):
        wr = window(img_r, ur0 + r * s, uv_l[:, 1])
        wr = wr - wr[:, w:w + 1, w:w + 1]
        return jnp.sum(jnp.abs(wl - wr), axis=(1, 2))

    sads = jnp.stack([sad_at(float(r)) for r in range(-slide, slide + 1)], 1)
    best = jnp.argmin(sads, axis=1)                # [N] in [0, 2*slide]
    interior = (best > 0) & (best < 2 * slide)
    bi = jnp.clip(best, 1, 2 * slide - 1)
    sm1 = sads[jnp.arange(N), bi - 1]
    s0 = sads[jnp.arange(N), bi]
    sp1 = sads[jnp.arange(N), bi + 1]
    denom = sm1 - 2.0 * s0 + sp1
    delta = 0.5 * (sm1 - sp1) / jnp.where(jnp.abs(denom) > 1e-6, denom, 1e-6)
    delta = jnp.clip(delta, -1.0, 1.0)
    off = (bi.astype(jnp.float32) - slide + delta) * s
    ur_ref = jnp.where(matched & interior, ur0 + off, ur0)
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
                               n_images=2)
    K = camera.intrinsics(cfg.camera)
    bf = cfg.camera.bf
    scale_factors = jnp.asarray(cfg.orb.scale_factors, jnp.float32)

    def fn(img_l, img_r, frame_id, timestamp):
        both = extract2(jnp.stack([img_l, img_r]))
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

        ur, sad = _sad_subpixel(img_l, img_r, fl.uv, ur0, fl.octave, matched,
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

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


def build_stereo_frame_fn(cfg: SLAMConfig):
    """Stereo: extract on both images (batched), match left-right within row
    bands and the valid disparity range, keep best-Hamming candidate
    (reference Frame::ComputeStereoMatches, Frame.cc:466-640; the +-5px SAD
    subpixel pass is replaced by keypoint-accurate disparity for now)."""
    extract = build_extractor(cfg.orb, cfg.camera.height, cfg.camera.width)
    K = camera.intrinsics(cfg.camera)
    bf = cfg.camera.bf
    scale_factors = jnp.asarray(cfg.orb.scale_factors, jnp.float32)
    th_dist = float(hamming.N_BITS)  # gate applied below

    def fn(img_l, img_r, frame_id, timestamp):
        fl = extract(img_l)
        fr = extract(img_r)
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
        ur = jnp.where(matched, fr.uv[jnp.clip(res.idx, 0, None), 0], -1.0)
        disp_m = jnp.clip(fl.uv[:, 0] - ur, 0.01, None)
        depth = jnp.where(matched, bf / disp_m, -1.0)
        n = fl.uv.shape[0]
        return _finish(cfg, fl, jnp.where(matched, ur, jnp.full((n,), -1.0)),
                       depth, frame_id, timestamp)

    return fn

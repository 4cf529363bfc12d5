"""Map initialization: monocular two-view bootstrap and stereo/RGB-D
single-frame bootstrap (reference Tracking::MonocularInitialization
Tracking.cc:563-737 and StereoInitialization Tracking.cc:509-561)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam2_tpu.config import SLAMConfig
from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.map import ops
from orb_slam2_tpu.map.state import MapState
from orb_slam2_tpu.matching import search
from orb_slam2_tpu.pipeline.frame import Frame
from orb_slam2_tpu.pipeline.tracking import TrackState, OK, NOT_INITIALIZED
from orb_slam2_tpu.solvers import twoview


def store_init_frame(ts: TrackState, frame: Frame) -> TrackState:
    """Snapshot the first mono frame (reference Tracking.cc:567-580)."""
    return ts._replace(
        init_valid_frame=frame.n > 100,
        init_uv=frame.uv, init_angle=frame.angle, init_octave=frame.octave,
        init_desc=frame.desc, init_kp_valid=frame.valid,
        init_frame_id=frame.frame_id, init_timestamp=frame.timestamp)


def match_for_init(ts: TrackState, frame: Frame, cfg: SLAMConfig):
    """SearchForInitialization between the stored first frame and the current
    frame (reference Tracking.cc:593)."""
    return search.search_for_initialization(
        ts.init_uv, ts.init_desc, ts.init_angle, ts.init_octave,
        ts.init_kp_valid, frame.uv, frame.desc, frame.angle, frame.octave,
        frame.valid, window=float(cfg.match.init_window),
        max_dist=float(cfg.match.th_init), ratio=cfg.match.nn_ratio_init)


def create_mono_map(state: MapState, ts: TrackState, frame: Frame,
                    match_idx: jnp.ndarray, key, cfg: SLAMConfig):
    """Run two-view reconstruction and populate the map
    (reference Tracking::CreateInitialMapMonocular Tracking.cc:637-737).

    Returns (state, ts, ok).  On ok: two keyframes + triangulated points,
    scaled so median scene depth = 1 (Tracking.cc:689-713)."""
    K = camera.intrinsics(cfg.camera)
    matched = match_idx >= 0
    uv2 = frame.uv[jnp.clip(match_idx, 0, None)]
    res = twoview.initialize(key, K, ts.init_uv, uv2, matched, cfg.init)

    # median-depth normalization
    z = res.points[:, 2]
    good = res.good
    n_good = jnp.maximum(jnp.sum(good.astype(jnp.int32)), 1)
    z_sorted = jnp.sort(jnp.where(good, z, jnp.inf))
    med = z_sorted[jnp.clip((n_good - 1) // 2, 0, z.shape[0] - 1)]
    inv_med = 1.0 / jnp.maximum(med, 1e-6)
    pts = res.points * inv_med
    T21 = res.T21.at[4:7].multiply(inv_med)

    # build KF0 frame view from the stored snapshot
    n = ts.init_uv.shape[0]
    f0 = Frame(uv=ts.init_uv, uv_raw=ts.init_uv,
               ur=jnp.full((n,), -1.0), depth=jnp.full((n,), -1.0),
               octave=ts.init_octave, angle=ts.init_angle, desc=ts.init_desc,
               valid=ts.init_kp_valid, frame_id=ts.init_frame_id,
               timestamp=ts.init_timestamp)

    state, k0 = ops.insert_keyframe(state, f0, lie.se3_identity(),
                                    jnp.full((n,), -1, jnp.int32))
    state, k1 = ops.insert_keyframe(state, frame, T21,
                                    jnp.full((n,), -1, jnp.int32))
    state, pids = ops.alloc_points(state, good & matched, pts, ts.init_desc, k0)
    state = ops.add_obs(state, k0, jnp.arange(n), pids)
    # map pid rows (indexed by init kp) onto current-frame kp slots
    tgt = jnp.where((pids >= 0), jnp.clip(match_idx, 0, None), n)
    cur_pids = jnp.concatenate([jnp.full((n,), -1, jnp.int32),
                                jnp.full((1,), -1, jnp.int32)]).at[
        tgt].set(pids)[:n]
    state = ops.add_obs(state, k1, jnp.arange(n), cur_pids)
    from orb_slam2_tpu.map.state import update_covisibility_for_kf
    state = update_covisibility_for_kf(state, k1)
    state = ops.update_point_attributes(
        state, pids_mask_from(pids, state.mp_pos.shape[0]),
        cfg.orb.scale_factor, cfg.orb.n_levels)

    ts = ts._replace(
        status=jnp.asarray(OK, jnp.int32), T=T21,
        last_T=T21, velocity=lie.se3_identity(),
        has_velocity=jnp.asarray(False),
        last_pids=cur_pids, last_uv=frame.uv, last_octave=frame.octave,
        last_angle=frame.angle, last_valid=frame.valid,
        last_desc=frame.desc, last_depth=frame.depth,
        ref_kf=k1, last_kf_frame_id=frame.frame_id,
        init_valid_frame=jnp.asarray(False))
    # log the first init frame's pose (identity at KF0) into the trajectory
    # so exports start at the true sequence start (System.cc:361 includes it)
    i0 = jnp.clip(ts.init_frame_id, 0, ts.traj.shape[0] - 1)
    row0 = jnp.concatenate([
        lie.se3_identity(), lie.se3_identity(),
        jnp.stack([k0.astype(jnp.float32), jnp.float32(1.0),
                   ts.init_timestamp.astype(jnp.float32)])])
    ts = ts._replace(traj=ts.traj.at[i0].set(row0))
    return state, ts, res.ok


def pids_mask_from(pids: jnp.ndarray, M: int) -> jnp.ndarray:
    return jnp.zeros((M + 1,), bool).at[
        jnp.where(pids >= 0, pids, M)].set(True)[:M]


def stereo_initialize(state: MapState, ts: TrackState, frame: Frame,
                      cfg: SLAMConfig):
    """Stereo/RGB-D bootstrap: pose = identity, every keypoint with depth
    becomes a map point (reference Tracking.cc:509-561)."""
    n = frame.uv.shape[0]
    K = camera.intrinsics(cfg.camera)
    has_depth = frame.valid & (frame.depth > 0)
    pw = camera.unproject(K, frame.uv, frame.depth)  # cam == world (pose I)
    state, k0 = ops.insert_keyframe(state, frame, lie.se3_identity(),
                                    jnp.full((n,), -1, jnp.int32))
    state, pids = ops.alloc_points(state, has_depth, pw, frame.desc, k0)
    state = ops.add_obs(state, k0, jnp.arange(n), pids)
    state = ops.update_point_attributes(
        state, pids_mask_from(pids, state.mp_pos.shape[0]),
        cfg.orb.scale_factor, cfg.orb.n_levels)
    ts = ts._replace(
        status=jnp.asarray(OK, jnp.int32), T=lie.se3_identity(),
        last_T=lie.se3_identity(), velocity=lie.se3_identity(),
        has_velocity=jnp.asarray(False),
        last_pids=pids, last_uv=frame.uv, last_octave=frame.octave,
        last_angle=frame.angle, last_valid=frame.valid,
        last_desc=frame.desc, last_depth=frame.depth,
        ref_kf=k0, last_kf_frame_id=frame.frame_id)
    ok = frame.n >= cfg.tracking.stereo_init_min_kps
    return state, ts, ok

"""Per-frame tracking: the TPU re-design of the reference `Tracking` state
machine (Tracking.cc:267-506).

Each phase is a pure jitted function over (MapState, TrackState, Frame); the
thin host orchestration in `system.py` branches on the tracked status between
phases (mirroring the reference's state machine, but deterministic — no
queue-idle heuristics).

Key data layout: `cur_pids [N]` — the map-point id matched to each current
keypoint (-1 = none) — plays the role of `Frame::mvpMapPoints`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.config import SLAMConfig
from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.map.state import MapState, resolve_replaced
from orb_slam2_tpu.matching import hamming, search
from orb_slam2_tpu.pipeline.frame import Frame
from orb_slam2_tpu.solvers import pose_opt

# status codes (reference Tracking.h:81-87)
NO_IMAGES = 0
NOT_INITIALIZED = 1
OK = 2
LOST = 3


class TrackState(NamedTuple):
    status: jnp.ndarray       # i32
    T: jnp.ndarray            # [7] current Tcw
    velocity: jnp.ndarray     # [7] Tcw_cur * Twc_last
    has_velocity: jnp.ndarray  # bool
    last_T: jnp.ndarray       # [7]
    last_pids: jnp.ndarray    # [N] map point per last-frame keypoint
    last_uv: jnp.ndarray      # [N, 2] last-frame keypoint coords
    last_octave: jnp.ndarray  # [N]
    last_angle: jnp.ndarray   # [N]
    last_valid: jnp.ndarray   # [N]
    last_desc: jnp.ndarray    # [N, 32] u8 — for localization-mode VO points
    last_depth: jnp.ndarray   # [N] last-frame keypoint depth (-1 = none)
    ref_kf: jnp.ndarray       # i32
    last_kf_frame_id: jnp.ndarray  # i32 frame id at last KF insertion
    last_reloc_frame_id: jnp.ndarray  # i32
    # mono-init first-frame buffer (reference mInitialFrame)
    init_valid_frame: jnp.ndarray  # bool
    init_uv: jnp.ndarray      # [N, 2]
    init_angle: jnp.ndarray   # [N]
    init_octave: jnp.ndarray  # [N]
    init_desc: jnp.ndarray    # [N, 32]
    init_kp_valid: jnp.ndarray  # [N]
    init_frame_id: jnp.ndarray  # i32
    init_timestamp: jnp.ndarray  # f32
    # staged keyframe integration (the deterministic LocalMapping thread,
    # LocalMapping.cc:47-112: one stage advances per tracked frame)
    map_kf: jnp.ndarray       # i32 keyframe being integrated (-1 = idle)
    map_stage: jnp.ndarray    # i32 next stage to run
    ba_lam: jnp.ndarray       # f32 LM damping carried across BA chunks
    # device-side trajectory log (downloaded once at export time; avoids the
    # per-frame device->host sync that dominates through the TPU tunnel).
    # ONE packed [F, 17] f32 array — cols 0:7 Tcw, 7:14 Tcr (relative to
    # the reference KF), 14 ref KF id, 15 ok flag, 16 timestamp — so the
    # per-frame log costs ONE scatter instead of five
    traj: jnp.ndarray         # [F, 17] f32


def empty_track_state(cfg: SLAMConfig) -> TrackState:
    N = cfg.orb.max_keypoints
    return TrackState(
        status=jnp.asarray(NOT_INITIALIZED, jnp.int32),
        T=lie.se3_identity(),
        velocity=lie.se3_identity(),
        has_velocity=jnp.asarray(False),
        last_T=lie.se3_identity(),
        last_pids=jnp.full((N,), -1, jnp.int32),
        last_uv=jnp.zeros((N, 2), jnp.float32),
        last_octave=jnp.zeros((N,), jnp.int32),
        last_angle=jnp.zeros((N,), jnp.float32),
        last_valid=jnp.zeros((N,), bool),
        last_desc=jnp.zeros((N, 32), jnp.uint8),
        last_depth=jnp.full((N,), -1.0, jnp.float32),
        ref_kf=jnp.asarray(-1, jnp.int32),
        last_kf_frame_id=jnp.asarray(-1, jnp.int32),
        last_reloc_frame_id=jnp.asarray(-1000000, jnp.int32),
        init_valid_frame=jnp.asarray(False),
        init_uv=jnp.zeros((N, 2), jnp.float32),
        init_angle=jnp.zeros((N,), jnp.float32),
        init_octave=jnp.zeros((N,), jnp.int32),
        init_desc=jnp.zeros((N, 32), jnp.uint8),
        init_kp_valid=jnp.zeros((N,), bool),
        init_frame_id=jnp.asarray(-1, jnp.int32),
        init_timestamp=jnp.asarray(0.0, jnp.float32),
        map_kf=jnp.asarray(-1, jnp.int32),
        map_stage=jnp.asarray(0, jnp.int32),
        ba_lam=jnp.asarray(1e-4, jnp.float32),
        traj=jnp.zeros((cfg.cap.max_frames, 17), jnp.float32)
        .at[:, 0].set(1.0).at[:, 7].set(1.0).at[:, 14].set(-1.0),
    )


def record_traj(state: MapState, ts: TrackState, frame: Frame,
                ok) -> TrackState:
    """Log this frame's pose on device (reference trajectory bookkeeping,
    Tracking.cc:488-504: store Tcr = Tcw * Twr so later KF optimization
    benefits exported frames)."""
    i = jnp.clip(frame.frame_id, 0, ts.traj.shape[0] - 1)
    ref = jnp.clip(ts.ref_kf, 0, None)
    rel = lie.se3_compose(ts.T, lie.se3_inverse(state.kf_pose[ref]))
    row = jnp.concatenate([
        ts.T, rel,
        jnp.stack([ts.ref_kf.astype(jnp.float32),
                   jnp.asarray(ok, jnp.float32).reshape(()),
                   jnp.asarray(frame.timestamp, jnp.float32).reshape(())])])
    return ts._replace(traj=ts.traj.at[i].set(row))


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def predict_scale(dist: jnp.ndarray, max_dist: jnp.ndarray,
                  scale_factor: float, n_levels: int) -> jnp.ndarray:
    """Predicted pyramid level from distance (reference MapPoint::PredictScale
    MapPoint.cc:385-417)."""
    ratio = jnp.maximum(max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    lvl = jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor)).astype(jnp.int32)
    return jnp.clip(lvl, 0, n_levels - 1)


def _pose_opt_from_pos(frame: Frame, pw, valid, T0, K, bf, cfg):
    """Run motion-only BA on the current frame given per-keypoint world
    positions (covers both map points and localization-mode VO points)."""
    inv_sigma2 = 1.0 / (cfg.orb.scale_factor ** 2) ** frame.octave.astype(jnp.float32)
    is_stereo = frame.ur >= 0
    res = pose_opt.pose_optimize(T0, pw, frame.uv, frame.ur, inv_sigma2,
                                 valid & frame.valid, is_stereo, K, bf, cfg.ba)
    return res


def _pose_opt_from_pids(state: MapState, frame: Frame, pids, T0, K, bf, cfg):
    """Run motion-only BA on the current frame given per-keypoint point ids."""
    safe = jnp.clip(pids, 0, None)
    return _pose_opt_from_pos(frame, state.mp_pos[safe], pids >= 0, T0, K,
                              bf, cfg)


# ---------------------------------------------------------------------------
# tracking phases
# ---------------------------------------------------------------------------

def track_with_motion_model(state: MapState, ts: TrackState, frame: Frame,
                            cfg: SLAMConfig, loc_only=None):
    """Reference Tracking::TrackWithMotionModel (Tracking.cc:867-928):
    constant-velocity prediction, project last frame's points, windowed
    search (radius th * scale of last octave), pose optimization.

    In localization-only mode with a depth sensor, last-frame keypoints that
    have depth but no map point become temporal "VO points"
    (Tracking::UpdateLastFrame, Tracking.cc:801-865): they join the
    candidate set (position = last-pose unprojection) and the pose
    optimization, but never enter the map.

    Returns (cur_pids [N], pose-opt result, ok flag)."""
    K = camera.intrinsics(cfg.camera)
    bf = cfg.camera.bf
    T_pred = lie.se3_compose(ts.velocity, ts.last_T)

    pids = resolve_replaced(state, ts.last_pids)
    safe = jnp.clip(pids, 0, None)
    pt_valid = (pids >= 0) & ts.last_valid & state.mp_valid[safe]
    pw = state.mp_pos[safe]
    desc = state.mp_desc[safe]
    if loc_only is not None and cfg.sensor != 0:
        # temporal VO points: closest-depth unmatched keypoints of the last
        # frame (reference caps at ~100 closest; the dense matcher takes all
        # candidates below the close-depth threshold, same recall)
        thd = cfg.camera.th_depth * cfg.camera.baseline
        vo_ok = (loc_only & ts.last_valid & (pids < 0) &
                 (ts.last_depth > 0) & (ts.last_depth < thd))
        pc_last = camera.unproject(K, ts.last_uv, ts.last_depth)
        pw_vo = lie.se3_apply(lie.se3_inverse(ts.last_T), pc_last)
        pw = jnp.where(vo_ok[:, None], pw_vo, pw)
        desc = jnp.where(vo_ok[:, None], ts.last_desc, desc)
        pt_valid = pt_valid | vo_ok
    pc = lie.se3_apply(T_pred, pw)
    uv_pred = camera.project(K, pc)
    bounds = jnp.asarray([0.0, cfg.camera.width, 0.0, cfg.camera.height])
    pt_valid = pt_valid & (pc[..., 2] > 0) & camera.in_image(uv_pred, bounds)

    th = float(cfg.match.search_window_track if cfg.sensor != 0
               else cfg.match.search_window_track_mono)
    radius = th * cfg.orb.scale_factor ** ts.last_octave.astype(jnp.float32)

    res = search.search_by_projection(
        uv_pred, ts.last_octave, desc, pt_valid,
        frame.uv, frame.octave, frame.desc, frame.angle, frame.valid,
        radius, max_dist=cfg.match.th_high, ratio=None, oct_lo=-1, oct_hi=1)
    idx = search.rotation_consistency(ts.last_angle, frame.angle, res.idx,
                                      cfg.match.histo_length)

    # scatter per-current-kp: map-point id, matched 3D position, match flag
    N = frame.uv.shape[0]
    tgt = jnp.where(idx >= 0, idx, N)
    pad_i = jnp.full((N + 1,), -1, jnp.int32)
    cur_pids = pad_i.at[tgt].set(jnp.where(idx >= 0, pids, -1))[:N]
    cur_pos = jnp.zeros((N + 1, 3), pw.dtype).at[tgt].set(pw)[:N]
    cur_has = jnp.zeros((N + 1,), bool).at[tgt].set(idx >= 0)[:N]

    n_matches = jnp.sum(cur_has.astype(jnp.int32))
    opt = _pose_opt_from_pos(frame, cur_pos, cur_has, T_pred, K, bf, cfg)
    cur_pids = jnp.where(opt.inliers, cur_pids, -1)
    ok = (n_matches >= cfg.tracking.min_matches_motion) & \
         (opt.n_inliers >= cfg.tracking.min_inliers_track)
    return cur_pids, opt, ok


def track_reference_keyframe(state: MapState, ts: TrackState, frame: Frame,
                             cfg: SLAMConfig):
    """Reference Tracking::TrackReferenceKeyFrame (Tracking.cc:757-799):
    descriptor match against the reference KF (brute-force matmul replaces
    SearchByBoW), pose optimization from the last pose."""
    K = camera.intrinsics(cfg.camera)
    bf = cfg.camera.bf
    r = ts.ref_kf
    kf_desc = state.kf_desc[r]
    kf_pids = resolve_replaced(state, state.kf_obs[r])
    safe = jnp.clip(kf_pids, 0, None)
    row_valid = (kf_pids >= 0) & state.kf_kp_valid[r] & state.mp_valid[safe]

    dist = hamming.hamming_matrix(kf_desc, frame.desc)
    res = search.match_descriptors(
        dist, jnp.ones_like(dist, dtype=bool), cfg.match.th_low,
        cfg.match.nn_ratio_track_ref, row_valid, frame.valid)
    idx = search.rotation_consistency(state.kf_angle[r], frame.angle, res.idx,
                                      cfg.match.histo_length)
    N = frame.uv.shape[0]
    tgt = jnp.where(idx >= 0, idx, N)
    cur_pids = jnp.concatenate([jnp.full((N,), -1, jnp.int32),
                                jnp.full((1,), -1, jnp.int32)]).at[
        tgt].set(jnp.where(idx >= 0, kf_pids, -1))[:N]
    n_matches = jnp.sum((cur_pids >= 0).astype(jnp.int32))
    opt = _pose_opt_from_pids(state, frame, cur_pids, ts.last_T, K, bf, cfg)
    cur_pids = jnp.where(opt.inliers, cur_pids, -1)
    ok = (n_matches >= cfg.tracking.min_matches_ref_kf) & \
         (opt.n_inliers >= cfg.tracking.min_inliers_track)
    return cur_pids, opt, ok


def track_local_map(state: MapState, ts: TrackState, frame: Frame,
                    T: jnp.ndarray, cur_pids: jnp.ndarray, cfg: SLAMConfig,
                    after_reloc: jnp.ndarray):
    """Reference Tracking::TrackLocalMap + SearchLocalPoints
    (Tracking.cc:930-974, 1143-1193).

    The local point set follows the reference's UpdateLocalKeyFrames
    (Tracking.cc:1231-1339): keyframes voted by the currently matched points
    (K1) plus their covisible neighbors (K2), then every point those
    keyframes observe.  This locality matters beyond cost: matching against
    the *whole* map would silently re-acquire old points on loop revisits,
    hiding drift from the loop-closing pipeline (and at KITTI scale the
    dense [M]-wide match is HBM-hostile)."""
    K = camera.intrinsics(cfg.camera)
    bf = cfg.camera.bf
    M = state.mp_pos.shape[0]
    K_ = state.kf_obs.shape[0]

    # K1: observers of currently matched points, by vote (Tracking.cc:1247)
    safe_c = jnp.clip(cur_pids, 0, None)
    obs_kf_cur = state.mp_obs_kf[safe_c]                  # [N, D]
    vote_ok = (cur_pids >= 0)[:, None] & (obs_kf_cur >= 0)
    votes = jnp.zeros((K_ + 1,), jnp.int32).at[
        jnp.where(vote_ok, obs_kf_cur, K_)].add(1)[:K_]
    topv, topk = jax.lax.top_k(votes, min(cfg.cap.local_window, K_))
    k1_ok = topv > 0
    # dummy writes go to slot K_ (not a real slot) — with duplicate indices
    # .at[].set order is undefined, so using index 0 as dummy could drop KF 0
    k1_mask = jnp.zeros((K_ + 1,), bool).at[
        jnp.where(k1_ok, topk, K_)].set(True)[:K_] & state.kf_valid
    # K2: covisible neighbors of K1 (Tracking.cc:1294-1331)
    nb_mask = jnp.any(k1_mask[:, None] & (state.covis > 0), axis=0)
    local_kf = (k1_mask | nb_mask) & state.kf_valid
    # local points: everything the local keyframes observe (Tracking.cc:1205)
    lobs = state.kf_obs
    pt_local = jnp.zeros((M + 1,), bool).at[
        jnp.where(local_kf[:, None] & (lobs >= 0), lobs, M)].set(True)[:M]

    pc = lie.se3_apply(T, state.mp_pos)
    uv_pred = camera.project(K, pc)
    bounds = jnp.asarray([0.0, cfg.camera.width, 0.0, cfg.camera.height])
    dist = jnp.linalg.norm(
        state.mp_pos + lie.quat_rotate(lie.quat_conj(lie.se3_q(T)), lie.se3_t(T)),
        axis=-1)  # |p - camera_center|
    # frustum gates (reference Frame::isInFrustum Frame.cc:269-325)
    view_cos = jnp.sum(
        (state.mp_pos + lie.quat_rotate(lie.quat_conj(lie.se3_q(T)),
                                        lie.se3_t(T))) * state.mp_normal, -1
    ) / jnp.maximum(dist, 1e-9)
    in_band = (dist >= 0.8 * state.mp_min_dist) & (dist <= 1.2 * state.mp_max_dist)
    visible = (state.mp_valid & pt_local & (pc[:, 2] > 0) &
               camera.in_image(uv_pred, bounds) & in_band & (view_cos > 0.5))

    # already-matched points are skipped for search but counted visible
    already = jnp.zeros((M + 1,), bool).at[
        jnp.where(cur_pids >= 0, cur_pids, M)].set(True)[:M]
    pred_oct = predict_scale(dist, state.mp_max_dist, cfg.orb.scale_factor,
                             cfg.orb.n_levels)
    r_base = jnp.where(view_cos > 0.998, 2.5, 4.0)
    th = jnp.where(after_reloc, 5.0, 1.0)
    radius = r_base * th * cfg.orb.scale_factor ** pred_oct.astype(jnp.float32)

    # compact the candidate set to a fixed window: [M, N] gate masks over the
    # full point capacity are HBM-bound; the frustum rarely holds more than a
    # few thousand points, so gather them into P slots first.
    P = min(4096, M)
    searchable = visible & ~already
    # top_k (not a full M-wide argsort) to compact searchable ids into P slots
    _, sel = jax.lax.top_k(searchable.astype(jnp.int32), P)
    sel_ok = searchable[sel]

    res = search.search_by_projection(
        uv_pred[sel], pred_oct[sel], state.mp_desc[sel], sel_ok,
        frame.uv, frame.octave, frame.desc, frame.angle,
        frame.valid & (cur_pids < 0),
        radius[sel], max_dist=cfg.match.th_high,
        ratio=cfg.match.nn_ratio_local, oct_lo=-1, oct_hi=0)

    N = frame.uv.shape[0]
    tgt = jnp.where(res.idx >= 0, res.idx, N)
    add_pids = jnp.concatenate([jnp.full((N,), -1, jnp.int32),
                                jnp.full((1,), -1, jnp.int32)]).at[
        tgt].set(jnp.where(res.idx >= 0, sel, -1))[:N]
    cur_pids = jnp.where(cur_pids >= 0, cur_pids, add_pids)

    opt = _pose_opt_from_pids(state, frame, cur_pids,
                              T, camera.intrinsics(cfg.camera), bf, cfg)
    cur_pids = jnp.where(opt.inliers, cur_pids, -1)

    # visibility / found counter deltas (reference IncreaseVisible/
    # IncreaseFound).  Returned as deltas, NOT a new MapState: merging a full
    # state copy per frame costs tens of MB of HBM traffic for two counters.
    found = jnp.zeros((M + 1,), jnp.int32).at[
        jnp.where(cur_pids >= 0, cur_pids, M)].add(1)[:M]
    visible_d = visible.astype(jnp.int32)

    min_inl = jnp.where(after_reloc, cfg.tracking.min_inliers_local_map_reloc,
                        cfg.tracking.min_inliers_local_map)
    ok = opt.n_inliers >= min_inl
    return (visible_d, found), cur_pids, opt, ok


# ---------------------------------------------------------------------------
# fused per-frame step (single jit call per frame)
# ---------------------------------------------------------------------------

# HUD indices (the one small int32 vector downloaded per frame — and only
# asynchronously, several frames late: a synchronous device->host read costs
# tens of ms through the TPU tunnel)
HUD_STATUS = 0
HUD_N_INLIERS = 1
HUD_NEED_KF = 2
HUD_N_KF = 3
HUD_N_MP = 4
HUD_REF_KF = 5   # appended by the fused system step after KF insertion
HUD_LEN = 6


def build_track_step(cfg: SLAMConfig):
    """Returns a jittable fused per-frame step:

        (state, ts, frame) -> (state, ts, hud [HUD_LEN] i32)

    covering TrackWithMotionModel / TrackReferenceKeyFrame fallback /
    TrackLocalMap / velocity+bookkeeping updates / NeedNewKeyFrame — the
    whole per-frame path of reference Tracking::Track (Tracking.cc:267-506)
    in one XLA program, with zero intermediate host synchronization."""
    def step(state: MapState, ts: TrackState, frame: Frame, loc_only=None):
        if loc_only is None:
            loc_only = jnp.asarray(False)
        # --- phase 1: motion-model or reference-KF tracking ---
        def do_motion(_):
            pids, opt, ok = track_with_motion_model(state, ts, frame, cfg,
                                                    loc_only)
            return pids, opt.T, opt.n_inliers, ok

        def do_ref(_):
            pids, opt, ok = track_reference_keyframe(state, ts, frame, cfg)
            return pids, opt.T, opt.n_inliers, ok

        pids_m, T_m, ninl_m, ok_m = jax.lax.cond(
            ts.has_velocity, do_motion, do_ref, None)
        # fallback to reference-KF tracking if motion-model failed
        pids, T, ninl, ok1 = jax.lax.cond(
            ok_m, lambda _: (pids_m, T_m, ninl_m, ok_m), do_ref, None)

        # --- phase 2: local map tracking ---
        after_reloc = (frame.frame_id - ts.last_reloc_frame_id) < \
            cfg.tracking.reloc_recent_window
        (vis_d, found_d), pids2, opt2, ok2 = track_local_map(
            state, ts, frame, T, pids, cfg, after_reloc)
        ok = ok1 & ok2
        oki = ok.astype(jnp.int32)
        state = state._replace(
            mp_visible=state.mp_visible + oki * vis_d,
            mp_found=state.mp_found + oki * found_d)
        T = jnp.where(ok, opt2.T, ts.T)
        cur_pids = jnp.where(ok, pids2, -1)

        # --- phase 3: bookkeeping ---
        velocity = lie.se3_compose(T, lie.se3_inverse(ts.last_T))
        new_ts = ts._replace(
            status=jnp.where(ok, OK, LOST).astype(jnp.int32),
            T=T,
            velocity=jnp.where(ok, velocity, ts.velocity),
            has_velocity=ok,
            last_T=jnp.where(ok, T, ts.last_T),
            last_pids=jnp.where(ok, cur_pids, ts.last_pids),
            last_uv=jnp.where(ok, frame.uv, ts.last_uv),
            last_octave=jnp.where(ok, frame.octave, ts.last_octave),
            last_angle=jnp.where(ok, frame.angle, ts.last_angle),
            last_valid=jnp.where(ok, frame.valid, ts.last_valid),
            last_desc=jnp.where(ok, frame.desc, ts.last_desc),
            last_depth=jnp.where(ok, frame.depth, ts.last_depth))

        # --- phase 4: keyframe decision (reference Tracking.cc:977-1061) ---
        n_kf = state.n_kf
        min_obs = jnp.where(n_kf <= 2, 2, cfg.tracking.kf_min_obs)
        # stereo observations count double (MapPoint::Observations via
        # AddObservation, MapPoint.cc:96-109) — with plain per-KF counts a
        # fresh stereo map (1 KF, min_obs=2) yields n_ref=0, c2 never fires
        # and no second keyframe is ever inserted.
        # (computed for the ref KF's points only — the full-map
        # weighted_obs_count gathers M*D kf_ur entries, ~8 ms of the frame)
        robs = state.kf_obs[jnp.clip(ts.ref_kf, 0, None)]
        psafe = jnp.clip(robs, 0, None)
        okf_r = state.mp_obs_kf[psafe]                    # [N, D]
        okp_r = state.mp_obs_kp[psafe]
        has_o = okf_r >= 0
        ur_r = state.kf_ur[jnp.clip(okf_r, 0, None), jnp.clip(okp_r, 0, None)]
        cnt_ref = jnp.sum(jnp.where(has_o, jnp.where(ur_r >= 0, 2, 1), 0),
                          axis=1)
        n_ref = jnp.sum(((robs >= 0) &
                         (cnt_ref >= min_obs)).astype(jnp.int32))
        th_ratio = (cfg.tracking.kf_ref_ratio_mono if cfg.sensor == 0
                    else cfg.tracking.kf_ref_ratio_stereo)
        frames_since = frame.frame_id - ts.last_kf_frame_id
        n_inliers = opt2.n_inliers
        c1a = frames_since >= cfg.tracking.max_frames_hint
        gap_ok = frames_since >= cfg.tracking.min_kf_gap
        room = state.next_kf < state.kf_valid.shape[0] - 2
        if cfg.sensor != 0:
            # close-point conditions c1b/c1c (Tracking.cc:1002-1037): track
            # too few close points while enough close candidates exist
            thd = cfg.camera.th_depth * cfg.camera.baseline
            close = frame.valid & (frame.depth > 0) & (frame.depth < thd)
            n_tc = jnp.sum((close & (cur_pids >= 0)).astype(jnp.int32))
            n_ntc = jnp.sum((close & (cur_pids < 0)).astype(jnp.int32))
            need_close = (n_tc < cfg.tracking.close_depth_n) & \
                         (n_ntc > cfg.tracking.close_trackable_min)
            # c1b: MinFrames passed + mapping idle (Tracking.cc:1031) — the
            # deterministic idle substitute is the min_kf_gap throttle
            c1b = gap_ok
            c1c = (n_inliers < n_ref * 0.25) | need_close
            c2 = ((n_inliers < n_ref * th_ratio) | need_close) & \
                (n_inliers > 15)
            # reference combination: (c1a | c1b | c1c) & c2 (Tracking.cc:1039)
            need_kf = ok & room & ((c1a | c1b | c1c) & c2)
        else:
            c2 = (n_inliers < n_ref * th_ratio) & (n_inliers > 15)
            need_kf = ok & room & (c1a | (c2 & gap_ok))

        new_ts = record_traj(state, new_ts, frame, ok)

        hud = jnp.stack([
            jnp.where(ok, OK, LOST).astype(jnp.int32),
            n_inliers.astype(jnp.int32),
            need_kf.astype(jnp.int32),
            n_kf.astype(jnp.int32),
            state.n_mp.astype(jnp.int32)])
        return state, new_ts, cur_pids, hud

    return step

"""Local mapping at keyframe rate: new-point triangulation, point culling,
keyframe decision (reference LocalMapping.cc, run deterministically after a
keyframe insertion instead of on a separate thread)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam2_tpu.config import SLAMConfig
from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.map import ops
from orb_slam2_tpu.map.state import (MapState, covisible_neighbors,
                                     point_obs_count)
from orb_slam2_tpu.matching import hamming, search
from orb_slam2_tpu.solvers import triangulate as tri


def _camera_center(T):
    return -lie.quat_rotate(lie.quat_conj(lie.se3_q(T)), lie.se3_t(T))


def _fundamental(T1, T2, K):
    """F12 such that x2^T F x1 = 0 for pixel coords (reference
    LocalMapping::ComputeF12, LocalMapping.cc:536-553)."""
    T12 = lie.se3_compose(T1, lie.se3_inverse(T2))  # cam2 -> cam1
    # points in cam2 map to cam1: x1 = R12 x2 + t12 => E21? follow reference:
    # F12 = K1^-T [t12]_x R12 K2^-1 with x2^T F21 x1 — implement directly:
    R = lie.quat_to_matrix(lie.se3_q(T12))
    t = lie.se3_t(T12)
    E = lie.hat(t) @ R
    Kinv = jnp.asarray([[1.0 / K[0], 0, -K[2] / K[0]],
                        [0, 1.0 / K[1], -K[3] / K[1]],
                        [0, 0, 1.0]])
    return Kinv.T @ E @ Kinv


def median_scene_depth(state: MapState, k, K) -> jnp.ndarray:
    """Median depth of the map points observed by keyframe k (reference
    KeyFrame::ComputeSceneMedianDepth, KeyFrame.cc:633-663)."""
    obs = state.kf_obs[k]
    has = obs >= 0
    pw = state.mp_pos[jnp.clip(obs, 0, None)]
    z = lie.se3_apply(state.kf_pose[k], pw)[:, 2]
    n = jnp.maximum(jnp.sum(has.astype(jnp.int32)), 1)
    z_sorted = jnp.sort(jnp.where(has, z, jnp.inf))
    return z_sorted[jnp.clip((n - 1) // 2, 0, z.shape[0] - 1)]


def triangulate_new_points(state: MapState, kf_id, cfg: SLAMConfig,
                           n_neighbors: int | None = None) -> MapState:
    """Create new map points by triangulating unmatched keypoints of the new
    keyframe against its top covisible neighbors (reference
    LocalMapping::CreateNewMapPoints, LocalMapping.cc:207-452).

    All neighbors are processed in one batch; for each keypoint of the new
    KF the best-parallax valid candidate wins (the reference's first-come
    sequential scan is an artifact of its threading, not a requirement)."""
    K = camera.intrinsics(cfg.camera)
    sf = cfg.orb.scale_factor
    N = state.kf_obs.shape[1]
    if n_neighbors is None:
        # 20 mono / 10 stereo-RGBD best covisible KFs (LocalMapping.cc:217)
        n_neighbors = (cfg.mapping.triangulate_neighbors if cfg.sensor == 0
                       else cfg.mapping.triangulate_neighbors_stereo)

    neighbors = covisible_neighbors(state, kf_id, n_neighbors, min_weight=15)
    T1 = state.kf_pose[kf_id]
    c1 = _camera_center(T1)
    med_depth = median_scene_depth(state, kf_id, K)

    kp1_free = state.kf_kp_valid[kf_id] & (state.kf_obs[kf_id] < 0)
    desc1 = state.kf_desc[kf_id]
    uv1 = state.kf_uv[kf_id]
    oct1 = state.kf_octave[kf_id]
    ang1 = state.kf_angle[kf_id]
    sigma1 = sf ** oct1.astype(jnp.float32)

    def per_neighbor(nb):
        nb_safe = jnp.clip(nb, 0, None)
        T2 = state.kf_pose[nb_safe]
        c2 = _camera_center(T2)
        baseline = jnp.linalg.norm(c2 - c1)
        # mono baseline check: baseline/medianDepth >= 0.01
        # (LocalMapping.cc:255-261)
        base_ok = (nb >= 0) & (baseline / jnp.maximum(med_depth, 1e-9) > 0.01)

        kp2_free = state.kf_kp_valid[nb_safe] & (state.kf_obs[nb_safe] < 0)
        uv2 = state.kf_uv[nb_safe]
        oct2 = state.kf_octave[nb_safe]
        # epipolar gate: distance of x2 to line F12 x1 (reference
        # CheckDistEpipolarLine, ORBmatcher.cc:140-157)
        F = _fundamental(T2, T1, K)   # x2^T F x1
        ph1 = jnp.concatenate([uv1, jnp.ones((N, 1))], -1)
        ph2 = jnp.concatenate([uv2, jnp.ones((N, 1))], -1)
        l2 = ph1 @ F.T                 # [N1, 3] line in image 2
        num = (l2[:, None, :] * ph2[None, :, :]).sum(-1) ** 2
        den = jnp.maximum(l2[:, 0:1] ** 2 + l2[:, 1:2] ** 2, 1e-12)
        d_epi = num / den              # [N1, N2]
        sigma2_2 = (sf ** oct2.astype(jnp.float32)) ** 2
        gate = d_epi < 3.84 * sigma2_2[None, :]
        # epipole distance rejection (ORBmatcher.cc:743-749)
        e2 = camera.project(K, lie.se3_apply(T2, c1)[None])[0]
        far_from_epipole = jnp.sum((uv2 - e2) ** 2, -1) > \
            100.0 * sigma2_2
        gate = gate & far_from_epipole[None, :]

        dist = hamming.hamming_matrix(desc1, state.kf_desc[nb_safe])
        res = search.match_descriptors(dist, gate, cfg.match.th_low, None,
                                       kp1_free, kp2_free)
        idx = search.rotation_consistency(ang1, state.kf_angle[nb_safe],
                                          res.idx, cfg.match.histo_length)

        m = idx >= 0
        idx_s = jnp.clip(idx, 0, None)
        xn1 = (uv1 - K[2:4]) / K[:2]
        xn2 = (uv2[idx_s] - K[2:4]) / K[:2]
        pw = tri.triangulate_dlt(T1[None], T2[None], xn1, xn2)
        # acceptance gates (LocalMapping.cc:299-431)
        z1 = tri.depth_in(T1, pw)
        z2 = tri.depth_in(T2, pw)
        cosp = tri.parallax_cos(c1, c2, pw)
        e1 = tri.reprojection_error(T1, K, pw, uv1)
        e2r = tri.reprojection_error(T2, K, pw, uv2[idx_s])
        chi1 = e1 / jnp.maximum(sigma1 ** 2, 1e-9)
        chi2 = e2r / sigma2_2[idx_s]
        d1 = jnp.linalg.norm(pw - c1, axis=-1)
        d2 = jnp.linalg.norm(pw - c2, axis=-1)
        ratio_dist = d2 / jnp.maximum(d1, 1e-9)
        ratio_oct = sf ** (oct1 - oct2[idx_s]).astype(jnp.float32)
        ratio_factor = 1.5 * sf
        scale_ok = (ratio_dist > ratio_oct / ratio_factor) & \
                   (ratio_dist < ratio_oct * ratio_factor)
        good = (m & base_ok & jnp.all(jnp.isfinite(pw), -1) &
                (cosp < 0.9998) & (cosp > 0) & (z1 > 0) & (z2 > 0) &
                (chi1 < cfg.mapping.epipolar_chi2_mono) &
                (chi2 < cfg.mapping.epipolar_chi2_mono) & scale_ok)
        return good, pw, idx, cosp, nb

    goods, pws, idxs, cosps, nbs = jax.vmap(per_neighbor)(neighbors)

    # per keypoint, choose the neighbor with the smallest cos (max parallax)
    score = jnp.where(goods, 1.0 - cosps, -1.0)      # [NB, N]
    best_nb = jnp.argmax(score, axis=0)              # [N]
    any_good = jnp.any(goods, axis=0)
    pick = lambda arr: arr[best_nb, jnp.arange(N)]
    pw_best = pick(pws)
    idx_best = pick(idxs)
    nb_best = nbs[best_nb]

    state, pids = ops.alloc_points(state, any_good, pw_best,
                                   state.kf_desc[kf_id], kf_id)
    state = ops.add_obs(state, kf_id, jnp.arange(N), pids)
    # neighbor-side observations: ONE batched scatter over all neighbors
    # (each new point has exactly one best neighbor, satisfying
    # add_obs_multi's one-slot-per-point requirement; replaces an
    # n_neighbors-long sequential add_obs sweep costing ~3 ms each)
    state = ops.add_obs_multi(
        state, jnp.where(pids >= 0, nb_best, -1),
        jnp.clip(idx_best, 0, None), pids)
    from orb_slam2_tpu.pipeline.init import pids_mask_from
    state = ops.update_point_attributes(
        state, pids_mask_from(pids, state.mp_pos.shape[0]),
        cfg.orb.scale_factor, cfg.orb.n_levels)
    from orb_slam2_tpu.map.state import update_covisibility_for_kf
    state = update_covisibility_for_kf(state, kf_id)
    return state


def create_depth_points(state: MapState, kf_id, cfg: SLAMConfig) -> MapState:
    """Stereo/RGB-D: create points for close untracked keypoints with depth
    (reference Tracking::CreateNewKeyFrame, Tracking.cc:1078-1136)."""
    K = camera.intrinsics(cfg.camera)
    N = state.kf_obs.shape[1]
    depth = state.kf_depth[kf_id]
    free = state.kf_kp_valid[kf_id] & (state.kf_obs[kf_id] < 0)
    th_depth = cfg.camera.th_depth * cfg.camera.baseline if cfg.camera.bf > 0 \
        else jnp.inf
    has = free & (depth > 0)
    # close points always; far points by depth order until close_depth_n
    # total (reference sorts by depth and stops at 100 / thDepth,
    # Tracking.cc:1100-1136)
    rank = jnp.argsort(jnp.argsort(jnp.where(has, depth, jnp.inf)))
    want = has & ((depth < th_depth) | (rank < cfg.tracking.close_depth_n))
    T = state.kf_pose[kf_id]
    pc = camera.unproject(K, state.kf_uv[kf_id], depth)
    pw = lie.se3_apply(lie.se3_inverse(T), pc)
    state, pids = ops.alloc_points(state, want, pw, state.kf_desc[kf_id], kf_id)
    state = ops.add_obs(state, kf_id, jnp.arange(N), pids)
    from orb_slam2_tpu.pipeline.init import pids_mask_from
    state = ops.update_point_attributes(
        state, pids_mask_from(pids, state.mp_pos.shape[0]),
        cfg.orb.scale_factor, cfg.orb.n_levels)
    from orb_slam2_tpu.map.state import update_covisibility_for_kf
    state = update_covisibility_for_kf(state, kf_id)
    return state


def cull_points(state: MapState, kf_id, cfg: SLAMConfig) -> MapState:
    """Recent-point culling (reference LocalMapping::MapPointCulling,
    LocalMapping.cc:170-205): found-ratio < 0.25, or too few observations
    two keyframes after creation."""
    cnt = point_obs_count(state)
    found_ratio = state.mp_found.astype(jnp.float32) / \
        jnp.maximum(state.mp_visible, 1).astype(jnp.float32)
    age = kf_id - state.mp_first_kf   # in keyframes
    min_obs = 2 if cfg.sensor == 0 else cfg.mapping.cull_min_obs
    bad = state.mp_valid & (
        (found_ratio < cfg.mapping.found_ratio_min) |
        ((age >= 2) & (cnt <= min_obs)))
    # points older than 3 KFs are out of the probation window; points born in
    # the two bootstrap keyframes are exempt entirely — the reference's
    # probation list mlpRecentAddedMapPoints is only fed by LocalMapping
    # (LocalMapping.cc:441) and stereo VO creation, never by
    # CreateInitialMapMonocular / StereoInitialization, so the initial map is
    # never probation-culled.
    bad = bad & (age <= 3) & (state.mp_first_kf >= 2)
    return ops.cull_points(state, bad)


def cull_keyframe(state: MapState, ts, c, cfg: SLAMConfig):
    """Invalidate keyframe `c` (reference KeyFrame::SetBadFlag,
    KeyFrame.cc:453-545): erase its observations (discarding points left with
    nObs<=2, MapPoint.cc:111-137), re-parent its spanning-tree children by
    max covisibility, store the relative pose mTcp (KeyFrame.cc:538), and
    retarget device-trajectory records that referenced it to its parent so
    SaveTrajectory* stays exact (reference walks the parent chain at export,
    System.cc:361-366; here the chain is collapsed eagerly at cull time).

    Returns (state, ts)."""
    from orb_slam2_tpu.map.state import weighted_obs_count
    from orb_slam2_tpu.pipeline.tracking import TrackState  # noqa: F401 (doc)
    K = state.kf_valid.shape[0]
    M = state.mp_pos.shape[0]
    parent = state.kf_parent[c]
    parent = jnp.where(parent >= 0, parent, 0).astype(jnp.int32)
    rel_cp = lie.se3_compose(state.kf_pose[c],
                             lie.se3_inverse(state.kf_pose[parent]))
    pids = state.kf_obs[c]
    touched = jnp.zeros((M + 1,), bool).at[
        jnp.where(pids >= 0, pids, M)].set(True)[:M]
    state = ops.remove_obs(state, c, jnp.ones((state.kf_obs.shape[1],), bool))
    # EraseObservation discard rule: stereo-weighted nObs <= 2 after erase
    w_cnt = weighted_obs_count(state)
    state = ops.cull_points(state, touched & state.mp_valid & (w_cnt <= 2))
    state = state._replace(
        kf_valid=state.kf_valid.at[c].set(False),
        covis=state.covis.at[c, :].set(0).at[:, c].set(0),
        kf_bow=state.kf_bow.at[c].set(0.0),
        kf_pose_rel=state.kf_pose_rel.at[c].set(rel_cp))
    # re-parent children: greedy max-covisibility earlier valid KF
    # (KeyFrame.cc:479-535; earlier-id restriction keeps the tree acyclic),
    # falling back to the culled KF's own parent
    ids = jnp.arange(K)
    children = state.kf_parent == c
    w = jnp.where(state.kf_valid[None, :] & (ids[None, :] < ids[:, None]),
                  state.covis, -1)
    best = jnp.argmax(w, axis=1).astype(jnp.int32)
    new_par = jnp.where(jnp.max(w, axis=1) > 0, best, parent)
    state = state._replace(
        kf_parent=jnp.where(children, new_par, state.kf_parent))
    # retarget trajectory records: T_frame = rel o T_c = (rel o rel_cp) o T_p
    hit = ts.traj[:, 14].astype(jnp.int32) == c
    rel2 = jax.vmap(lambda r: lie.se3_compose(r, rel_cp))(ts.traj[:, 7:14])
    traj = ts.traj.at[:, 7:14].set(
        jnp.where(hit[:, None], rel2, ts.traj[:, 7:14]))
    traj = traj.at[:, 14].set(
        jnp.where(hit, parent.astype(jnp.float32), traj[:, 14]))
    ts = ts._replace(traj=traj)
    return state, ts


def cull_redundant_keyframes(state: MapState, ts, kf_id, cfg: SLAMConfig,
                             n_candidates: int = 10):
    """Reference LocalMapping::KeyFrameCulling (LocalMapping.cc:632-696):
    a covisible keyframe of the new KF is redundant if >90% of the map
    points it sees (close points only for stereo/RGB-D) are observed by at
    least 3 other keyframes at the same or finer scale.

    One keyframe is culled per pass (the most redundant) — the reference's
    sequential loop re-evaluates liveness after each SetBadFlag; culling the
    argmax per keyframe insertion gives the same bounded-map steady state
    without a sequential scan.  Returns (state, ts)."""
    th_obs = cfg.mapping.kf_cull_th_obs
    cands = covisible_neighbors(state, kf_id, n_candidates, min_weight=15)

    def redundancy(c):
        csafe = jnp.clip(c, 0, None)
        pids = state.kf_obs[csafe]
        valid = (pids >= 0)
        if cfg.sensor != 0:
            # only close stereo points count (LocalMapping.cc:657-661)
            thd = cfg.camera.th_depth * cfg.camera.baseline
            d = state.kf_depth[csafe]
            valid = valid & (d > 0) & (d < thd)
        safe = jnp.clip(pids, 0, None)
        okf = state.mp_obs_kf[safe]            # [N, D]
        okp = state.mp_obs_kp[safe]
        o_ok = okf >= 0
        kfs, kps = jnp.clip(okf, 0, None), jnp.clip(okp, 0, None)
        obs_oct = state.kf_octave[kfs, kps]
        wgt = jnp.where(state.kf_ur[kfs, kps] >= 0, 2, 1)
        tot_w = jnp.sum(jnp.where(o_ok, wgt, 0), axis=1)
        scale = state.kf_octave[csafe]
        fine = o_ok & (okf != csafe) & (obs_oct <= scale[:, None] + 1)
        n_fine = jnp.sum(fine.astype(jnp.int32), axis=1)
        red = valid & (tot_w > th_obs) & (n_fine >= th_obs)
        nmp = jnp.sum(valid.astype(jnp.int32))
        nred = jnp.sum(red.astype(jnp.int32))
        ratio = nred / jnp.maximum(nmp, 1).astype(jnp.float32)
        cull = ((c > 0) & (c != kf_id) & (nmp > 0) &
                (nred > cfg.mapping.kf_cull_redundancy * nmp))
        return cull, ratio

    culls, ratios = jax.vmap(redundancy)(cands)
    score = jnp.where(culls, ratios, -1.0)
    bi = jnp.argmax(score)
    c = jnp.where(culls[bi], cands[bi], -1)

    def do(args):
        st, t = args
        return cull_keyframe(st, t, jnp.clip(c, 0, None), cfg)

    return jax.lax.cond(c >= 0, do, lambda a: a, (state, ts))


def _apply_fuse_onepass(state: MapState, tgt_kf, tgt_ok, kp_a, m_a,
                        pids0) -> MapState:
    """Apply direction-A fuse bookkeeping for ALL targets in one batched
    pass (ORBmatcher::Fuse add/merge semantics, ORBmatcher.cc:951-969).

    tgt_kf [T] target keyframe ids (clipped), tgt_ok [T] validity,
    kp_a/m_a [T, N] matched keypoint per source row, pids0 [N] the new KF's
    point per row.  Adds claim free target keypoints; merges forward the
    point with fewer observations to the one with more.  Conflicts are
    resolved deterministically: lowest proposal index wins a contested
    target keypoint, one merge per loser, and a point that loses anywhere
    in this pass neither adds nor wins (no forwarding chains within a
    pass — one-hop staleness is resolved lazily via mp_replaced, exactly
    like the reference's MapPoint::Replace forwarding)."""
    from orb_slam2_tpu.map.state import point_obs_count
    K_, N = state.kf_obs.shape
    M, D = state.mp_obs_kf.shape
    T = tgt_kf.shape[0]
    KN = K_ * N

    cnt = point_obs_count(state)
    kp = jnp.clip(kp_a, 0, None)                          # [T, N]
    src_pid = jnp.where(m_a & tgt_ok[:, None],
                        jnp.broadcast_to(pids0, (T, N)), -1)
    src_ok = (src_pid >= 0) & state.mp_valid[jnp.clip(src_pid, 0, None)]
    existing = state.kf_obs[tgt_kf[:, None], kp]          # [T, N]
    matched = src_ok
    ex_safe = jnp.clip(existing, 0, None)
    add_case = matched & (existing < 0)
    merge_case = matched & (existing >= 0) & (existing != src_pid) & \
        state.mp_valid[ex_safe]

    # contested target keypoints: lowest proposal id wins
    prop = (jnp.arange(T)[:, None] * N + jnp.arange(N)[None, :])  # [T, N]
    key = tgt_kf[:, None] * N + kp                        # [T, N] global kp
    any_case = add_case | merge_case
    claim = jnp.full((KN + 1,), T * N, jnp.int32).at[
        jnp.where(any_case, key, KN)].min(prop)[:KN]
    keep = any_case & (claim[key] == prop)
    add_case &= keep
    merge_case &= keep

    # merges: point with fewer obs forwards to the one with more
    src_bigger = cnt[jnp.clip(src_pid, 0, None)] >= cnt[ex_safe]
    loser = jnp.where(src_bigger, existing, src_pid)
    winner = jnp.where(src_bigger, src_pid, existing)
    lsafe = jnp.clip(loser, 0, None)
    lclaim = jnp.full((M + 1,), T * N, jnp.int32).at[
        jnp.where(merge_case, lsafe, M)].min(prop)[:M]
    mkeep = merge_case & (lclaim[lsafe] == prop)
    loser_set = jnp.zeros((M + 1,), bool).at[
        jnp.where(mkeep, lsafe, M)].set(True)[:M]
    # no chains within the pass: drop merges whose winner loses elsewhere
    mkeep &= ~loser_set[jnp.clip(winner, 0, None)]
    loser_set = jnp.zeros((M + 1,), bool).at[
        jnp.where(mkeep, jnp.clip(loser, 0, None), M)].set(True)[:M]
    src_arr = jnp.full((M + 1,), -1, jnp.int32).at[
        jnp.where(mkeep, jnp.clip(loser, 0, None), M)].set(
        jnp.where(mkeep, loser, -1))[:M]
    dst_arr = jnp.full((M + 1,), -1, jnp.int32).at[
        jnp.where(mkeep, jnp.clip(loser, 0, None), M)].set(
        jnp.where(mkeep, winner, -1))[:M]
    src_arr = jnp.where(src_arr == jnp.arange(M), src_arr, -1)

    # adds: a losing point does not add; write kf_obs + ranked mirror slots
    add_case &= ~loser_set[jnp.clip(src_pid, 0, None)]
    kf_obs = jnp.concatenate(
        [state.kf_obs.reshape(-1), jnp.full((1,), -1, jnp.int32)]).at[
        jnp.where(add_case, key, KN)].set(
        jnp.where(add_case, src_pid, -1))[:KN].reshape(K_, N)
    # j-th add of a point (same source row n => same point; rank over t)
    rank = jnp.cumsum(add_case.astype(jnp.int32), axis=0) - 1     # [T, N]
    free = state.mp_obs_kf < 0
    free_order = jnp.argsort(~free, axis=1, stable=True)          # [M, D]
    n_free = jnp.sum(free.astype(jnp.int32), axis=1)
    psafe = jnp.clip(src_pid, 0, None)
    slot = free_order[psafe, jnp.clip(rank, 0, D - 1)]            # [T, N]
    can = add_case & (rank < n_free[psafe])
    pr = jnp.where(can, psafe, M)
    obs_kf_p = jnp.concatenate([state.mp_obs_kf,
                                jnp.full((1, D), -1, jnp.int32)])
    obs_kp_p = jnp.concatenate([state.mp_obs_kp,
                                jnp.full((1, D), -1, jnp.int32)])
    obs_kf_p = obs_kf_p.at[pr, slot].set(
        jnp.where(can, jnp.broadcast_to(tgt_kf[:, None], (T, N)), -1))
    obs_kp_p = obs_kp_p.at[pr, slot].set(
        jnp.where(can, jnp.broadcast_to(jnp.arange(N)[None, :], (T, N)), -1))
    state = state._replace(kf_obs=kf_obs, mp_obs_kf=obs_kf_p[:M],
                           mp_obs_kp=obs_kp_p[:M])
    return ops.replace_points(state, src_arr, dst_arr)


def fuse_neighbors(state: MapState, kf_id, cfg: SLAMConfig,
                   n_neighbors: int | None = None) -> MapState:
    """Two-way map-point fusion with covisible neighbors (reference
    LocalMapping::SearchInNeighbors, LocalMapping.cc:454-534 +
    ORBmatcher::Fuse, ORBmatcher.cc:825-975).

    Direction A: project the new KF's points into each neighbor; where a
    neighbor keypoint matches (radius/scale/descriptor gates), either add the
    observation (keypoint free) or merge the two points (keypoint already has
    one: the point with fewer observations forwards to the other).
    Direction B: the symmetric pass, neighbors' points into the new KF.
    Afterwards refresh descriptors/normals and the covisibility row.
    """
    K = camera.intrinsics(cfg.camera)
    sf = cfg.orb.scale_factor
    N = state.kf_obs.shape[1]
    M = state.mp_pos.shape[0]
    radius_base = cfg.mapping.fuse_radius
    if n_neighbors is None:
        n_neighbors = cfg.mapping.fuse_neighbors

    neighbors = covisible_neighbors(state, kf_id, n_neighbors, min_weight=15)
    # second-order targets: top covisibles of the first-order neighbors
    # (reference LocalMapping.cc:465-476 takes up to 5 per neighbor; here the
    # best few across all neighbors, deduplicated against the first order)
    n2 = cfg.mapping.fuse_neighbors_second
    if n2 > 0:
        K_ = state.covis.shape[0]
        nb_ok = neighbors >= 0
        w2 = jnp.max(jnp.where(nb_ok[:, None],
                               state.covis[jnp.clip(neighbors, 0, None)], 0),
                     axis=0)                               # [K]
        first = jnp.zeros((K_ + 1,), bool).at[
            jnp.where(nb_ok, neighbors, K_)].set(True)[:K_]
        first = first.at[jnp.clip(kf_id, 0, None)].set(True)
        w2 = jnp.where(state.kf_valid & ~first, w2, 0)
        top2_w, top2_i = jax.lax.top_k(w2, n2)
        second = jnp.where(top2_w >= 15, top2_i, -1).astype(jnp.int32)
        neighbors = jnp.concatenate([neighbors, second])

    from orb_slam2_tpu.pipeline.tracking import predict_scale
    bounds = jnp.asarray([0.0, cfg.camera.width, 0.0, cfg.camera.height])

    def match_points_into(state, pw, desc, min_d, max_d, normal, pt_ok, dst):
        """Pure matcher: project a point set into keyframe `dst` with the
        Fuse gates (frustum / distance band / viewing angle / scale window /
        descriptor / chi2 — ORBmatcher::Fuse, ORBmatcher.cc:856-936).
        Returns (kp index per point or -1, matched mask)."""
        T = state.kf_pose[dst]
        pc = lie.se3_apply(T, pw)
        uv = camera.project(K, pc)
        d = jnp.linalg.norm(pw + lie.quat_rotate(
            lie.quat_conj(T[:4]), T[4:7]), axis=-1)
        band = (d >= 0.8 * min_d) & (d <= 1.2 * max_d)
        vcos = jnp.sum((pw + lie.quat_rotate(lie.quat_conj(T[:4]), T[4:7])) *
                       normal, -1) / jnp.maximum(d, 1e-9)
        ok = pt_ok & (pc[:, 2] > 0) & camera.in_image(uv, bounds) & \
            band & (vcos > 0.5)
        pred = predict_scale(d, max_d, sf, cfg.orb.n_levels)
        radius = radius_base * sf ** pred.astype(jnp.float32)
        dist = hamming.hamming_matrix(desc, state.kf_desc[dst])
        gate = search.window_gate(uv, state.kf_uv[dst], radius)
        gate = gate & search.octave_gate(pred, state.kf_octave[dst], -1, 1)
        res = search.match_descriptors(dist, gate, cfg.match.th_low, None,
                                       ok, state.kf_kp_valid[dst])
        matched = res.idx >= 0
        kp = jnp.clip(res.idx, 0, None)
        err = jnp.sum((state.kf_uv[dst][kp] - uv) ** 2, -1)
        sig2 = (sf ** state.kf_octave[dst][kp].astype(jnp.float32)) ** 2
        matched = matched & (err / sig2 < 5.99)
        return jnp.where(matched, kp, -1), matched

    def fuse_cases(state, cnt, dst, kp, matched, src_pid):
        """Split one destination's matches into add vs merge sets (free
        keypoints gain the observation, occupied ones merge toward the
        point with more observations, ORBmatcher.cc:951-969).  Returns
        (add_case, loser, winner, merge_case)."""
        kp = jnp.clip(kp, 0, None)
        existing = state.kf_obs[dst][kp]
        add_case = matched & (existing < 0) & (src_pid >= 0)
        merge_case = matched & (existing >= 0) & (existing != src_pid) & \
            (src_pid >= 0) & state.mp_valid[jnp.clip(existing, 0, None)]
        src_bigger = cnt[jnp.clip(src_pid, 0, None)] >= \
            cnt[jnp.clip(existing, 0, None)]
        loser = jnp.where(src_bigger, existing, src_pid)
        winner = jnp.where(src_bigger, src_pid, existing)
        return add_case, loser, winner, merge_case

    def apply_fuse(state, dst, kp, matched, src_pid):
        """Full bookkeeping for one destination KF (used by direction B)."""
        cnt = point_obs_count(state)
        add_case, loser, winner, merge_case = fuse_cases(
            state, cnt, dst, jnp.clip(kp, 0, None), matched, src_pid)
        state = ops.add_obs(state, dst, jnp.clip(kp, 0, None),
                            jnp.where(add_case, src_pid, -1))
        # dummy writes target slot M (sliced off) so a genuine merge of
        # point M-1 cannot collide with them (write order is undefined)
        lsafe = jnp.where(merge_case, loser, M)
        src_arr = jnp.full((M + 1,), -1, jnp.int32).at[lsafe].set(
            jnp.where(merge_case, loser, -1))[:M]
        dst_arr = jnp.full((M + 1,), -1, jnp.int32).at[lsafe].set(
            jnp.where(merge_case, winner, -1))[:M]
        # guard: don't let a point replace itself or double-assign
        src_arr = jnp.where(src_arr == jnp.arange(M), src_arr, -1)
        return ops.replace_points(state, src_arr, dst_arr)

    # ---- direction A: the new KF's points into every target — match AND
    # bookkeeping in ONE pass over all T targets.  The reference's
    # per-target Fuse ordering (LocalMapping.cc:454-506) is an artifact of
    # its threading; here every case is computed from one consistent map
    # snapshot (which also removes the stale-src_pid hazard a sequential
    # apply loop has: an earlier target's merge can invalidate pids0) and
    # applied with batched scatters. ----
    pids0 = state.kf_obs[kf_id]
    safe0 = jnp.clip(pids0, 0, None)
    ok0 = (pids0 >= 0) & state.mp_valid[safe0]
    pw0 = state.mp_pos[safe0]
    desc0 = state.mp_desc[safe0]
    nb_safe = jnp.clip(neighbors, 0, None)
    kp_a, m_a = jax.vmap(
        lambda t, tok: match_points_into(
            state, pw0, desc0, state.mp_min_dist[safe0],
            state.mp_max_dist[safe0], state.mp_normal[safe0],
            ok0 & tok, t))(nb_safe, neighbors >= 0)     # [T, N] each
    state = _apply_fuse_onepass(state, nb_safe, neighbors >= 0, kp_a, m_a,
                                pids0)

    # ---- direction B: the union of the targets' points into the new KF as
    # ONE fuse (the reference collects vpFuseCandidates across all targets
    # and calls Fuse(current, candidates) once, LocalMapping.cc:508-534) ----
    tobs = state.kf_obs[nb_safe]                        # [T, N]
    tmask = jnp.zeros((M + 1,), bool).at[
        jnp.where((neighbors >= 0)[:, None] & (tobs >= 0), tobs, M)
    ].set(True)[:M] & state.mp_valid
    # exclude points the current KF already observes
    own = jnp.zeros((M + 1,), bool).at[
        jnp.where(pids0 >= 0, pids0, M)].set(True)[:M]
    cand = tmask & ~own
    P = min(2048, M)
    _, sel = jax.lax.top_k(cand.astype(jnp.int32), P)
    sel_ok = cand[sel]
    kp_b, m_b = match_points_into(
        state, state.mp_pos[sel], state.mp_desc[sel], state.mp_min_dist[sel],
        state.mp_max_dist[sel], state.mp_normal[sel], sel_ok,
        jnp.clip(kf_id, 0, None))
    # resolve duplicate destination keypoints (two candidate points matching
    # the same keypoint): keep the first via scatter-claim
    claim = jnp.full((N + 1,), -1, jnp.int32).at[
        jnp.where(m_b, kp_b, N)].set(
        jnp.where(m_b, jnp.arange(P), -1))[:N]
    m_b = m_b & (claim[jnp.clip(kp_b, 0, None)] == jnp.arange(P))
    state = apply_fuse(state, jnp.clip(kf_id, 0, None), kp_b, m_b,
                       jnp.where(m_b, sel, -1))
    # refresh attributes only for points touched by this fuse pass (observed
    # by the new KF or its neighbors) — the reference recomputes per fused
    # point (LocalMapping.cc:517-526), not over the whole map
    kfs = jnp.concatenate([jnp.atleast_1d(jnp.asarray(kf_id, jnp.int32)),
                           jnp.clip(neighbors, 0, None)])
    touched_obs = state.kf_obs[kfs]                   # [1+NB, N]
    tmask = jnp.zeros((M + 1,), bool).at[
        jnp.where(touched_obs >= 0, touched_obs, M).reshape(-1)].set(True)[:M]
    state = ops.update_point_attributes(
        state, tmask & state.mp_valid, cfg.orb.scale_factor, cfg.orb.n_levels)
    from orb_slam2_tpu.map.state import update_covisibility_for_kf
    state = update_covisibility_for_kf(state, kf_id)
    return state

"""Loop closing: detection, Sim3 verification, correction, pose-graph
optimization (reference LoopClosing.cc, run deterministically at keyframe
rate instead of on a thread).

Host/device split: the jitted `detect` returns candidate ids + covisibility
groups; the tiny temporal-consistency state machine (3 consecutive hits,
LoopClosing.cc:152-211) runs on host over those few ints; `verify` and
`correct` are jitted.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import SLAMConfig
from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.map import ops
from orb_slam2_tpu.map.state import MapState, covisible_neighbors
from orb_slam2_tpu.matching import hamming, search
from orb_slam2_tpu.place import database
from orb_slam2_tpu.place.vocab import l1_score
from orb_slam2_tpu.solvers import sim3 as sim3_mod
from orb_slam2_tpu.ba import posegraph


# ---------------------------------------------------------------------------
# detection (jit) + host consistency tracking
# ---------------------------------------------------------------------------

def detect(state: MapState, kf_id, cfg: SLAMConfig, n_cand: int = 8):
    """Loop candidates for the new keyframe (reference
    LoopClosing::DetectLoop, LoopClosing.cc:103-229).  Returns
    (cand_ids [C], cand_groups [C, K] bool covisibility groups)."""
    # minScore: lowest BoW similarity among covisible neighbors
    # (LoopClosing.cc:121-138)
    nb = covisible_neighbors(state, kf_id, 30, min_weight=15)
    nb_ok = nb >= 0
    scores = l1_score(state.kf_bow[kf_id][None, :],
                      state.kf_bow[jnp.clip(nb, 0, None)])
    min_score = jnp.min(jnp.where(nb_ok, scores, 1.0))

    res = database.detect_loop_candidates(
        state.kf_bow, state.kf_valid, state.covis, kf_id,
        state.kf_bow[kf_id], min_score, n_out=n_cand,
        shared_frac=cfg.loop.shared_word_frac,
        acc_frac=cfg.loop.acc_score_frac)
    csafe = jnp.clip(res.ids, 0, None)
    # candidate group = candidate + its *connected* KFs (weight >= 15, the
    # reference's GetConnectedKeyFrames semantics, KeyFrame.cc:289-379);
    # weight-1 covisibilities would make groups near-global and trivially
    # overlapping, defeating the temporal-consistency chain
    groups = (state.covis[csafe] >= 15) | \
        jax.nn.one_hot(csafe, state.covis.shape[0], dtype=bool)
    groups = groups & (res.ids >= 0)[:, None]
    return res.ids, groups


class ConsistencyTracker:
    """Host-side temporal consistency over candidate groups (reference
    mvConsistentGroups, LoopClosing.cc:152-211)."""

    def __init__(self, th: int = 3):
        self.th = th
        self.prev: list[tuple[set, int]] = []

    def update(self, cand_ids: np.ndarray, groups: np.ndarray) -> list[int]:
        """Returns candidate kf ids that reached the consistency threshold."""
        current = []
        enough = []
        for c, grp in zip(cand_ids, groups):
            if c < 0:
                continue
            gset = set(np.nonzero(grp)[0].tolist())
            best = 0
            for pset, cnt in self.prev:
                if gset & pset:
                    best = max(best, cnt + 1)
            current.append((gset, best))
            if best >= self.th:
                enough.append(int(c))
        self.prev = current
        return enough

    def reset(self):
        self.prev = []


# ---------------------------------------------------------------------------
# Sim3 verification (jit)
# ---------------------------------------------------------------------------

def verify(state: MapState, kf_id, cand_id, key, cfg: SLAMConfig):
    """Compute the relative Sim3 between the new KF and a loop candidate
    (reference LoopClosing::ComputeSim3, LoopClosing.cc:231-400).

    Returns (ok, Scw [8] corrected Sim3 world->current, matched loop point
    ids per current keypoint [N])."""
    K = camera.intrinsics(cfg.camera)
    sf = cfg.orb.scale_factor
    N = state.kf_obs.shape[1]
    M = state.mp_pos.shape[0]
    fix_scale = cfg.sensor != 0
    # The reference's absolute match-count gates (>=20 BoW, >=20 Sim3
    # inliers, >=40 total; LoopClosing.cc:274,330,389) are calibrated to its
    # 1000+-feature frames.  Available cross-KF matches scale with the
    # extraction budget, so the gates scale with it too (floor at half to
    # stay meaningful for tiny test configs).
    fscale = max(0.5, min(1.0, cfg.orb.n_features / 1000.0))
    min_bow = max(5, int(round(cfg.loop.min_bow_matches * fscale)))
    min_inl_gate = max(5, int(round(cfg.loop.min_sim3_inliers * fscale)))
    min_total = max(10, int(round(cfg.loop.min_total_matches * fscale)))

    # 1. descriptor matches between the two KFs' tracked points
    pids1 = state.kf_obs[kf_id]
    pids2 = state.kf_obs[cand_id]
    ok1 = (pids1 >= 0) & state.mp_valid[jnp.clip(pids1, 0, None)]
    ok2 = (pids2 >= 0) & state.mp_valid[jnp.clip(pids2, 0, None)]
    dist = hamming.hamming_matrix(state.kf_desc[kf_id], state.kf_desc[cand_id])
    res = search.match_descriptors(dist, jnp.ones_like(dist, bool),
                                   cfg.match.th_loop, cfg.match.nn_ratio_sim3,
                                   ok1, ok2)
    idx = search.rotation_consistency(state.kf_angle[kf_id],
                                      state.kf_angle[cand_id], res.idx,
                                      cfg.match.histo_length)
    matched = idx >= 0
    n_bow = jnp.sum(matched.astype(jnp.int32))

    # camera-frame points in each KF
    idx_s = jnp.clip(idx, 0, None)
    p1w = state.mp_pos[jnp.clip(pids1, 0, None)]
    p2w = state.mp_pos[jnp.clip(state.kf_obs[cand_id][idx_s], 0, None)]
    T1 = state.kf_pose[kf_id]
    T2 = state.kf_pose[cand_id]
    p1 = lie.se3_apply(T1, p1w)
    p2 = lie.se3_apply(T2, p2w)
    uv1 = state.kf_uv[kf_id]
    uv2 = state.kf_uv[cand_id][idx_s]
    sig1 = (sf ** state.kf_octave[kf_id].astype(jnp.float32)) ** 2
    sig2 = (sf ** state.kf_octave[cand_id][idx_s].astype(jnp.float32)) ** 2

    # 2. RANSAC Horn
    rr = sim3_mod.sim3_ransac(
        key, p1, p2, uv1, uv2, matched, K,
        cfg.loop.sim3_chi2 * sig1, cfg.loop.sim3_chi2 * sig2,
        fix_scale=fix_scale, iters=128,
        min_inliers=min_inl_gate)

    # 2b. SearchBySim3 two-way guided top-up (reference ORBmatcher.cc:
    # 1102-1326, call site LoopClosing.cc:323): project candidate points
    # into the current KF through S12 and current points into the candidate
    # through S12^-1; pairs that agree in both directions join the set.
    from orb_slam2_tpu.pipeline.tracking import predict_scale
    bounds = jnp.asarray([0.0, cfg.camera.width, 0.0, cfg.camera.height])
    # exclude pairs already matched by BoW from both projection searches
    # (vbAlreadyMatched1/2, ORBmatcher.cc:1130-1142) so a BoW-matched point
    # cannot be re-paired with a second keypoint and bias optimize_sim3
    cand_used = jnp.zeros((N + 1,), bool).at[
        jnp.where(matched, idx_s, N)].set(matched)[:N]
    p2_all = lie.se3_apply(T2, state.mp_pos[jnp.clip(pids2, 0, None)])
    pc1 = lie.sim3_apply(rr.S12, p2_all)                 # cand pts -> cam1
    uvp1 = camera.project(K, pc1)
    oct_p1 = predict_scale(jnp.linalg.norm(pc1, axis=-1),
                           state.mp_max_dist[jnp.clip(pids2, 0, None)],
                           sf, cfg.orb.n_levels)
    vis1 = ok2 & ~cand_used & (pc1[:, 2] > 0) & camera.in_image(uvp1, bounds)
    m1 = search.search_by_projection(
        uvp1, oct_p1, state.mp_desc[jnp.clip(pids2, 0, None)], vis1,
        state.kf_uv[kf_id], state.kf_octave[kf_id], state.kf_desc[kf_id],
        state.kf_angle[kf_id], state.kf_kp_valid[kf_id],
        cfg.loop.sim3_search_radius * sf ** oct_p1.astype(jnp.float32),
        max_dist=cfg.match.th_high, ratio=None, oct_lo=-1, oct_hi=0)
    pc2r = lie.sim3_apply(lie.sim3_inverse(rr.S12), p1)  # cur pts -> cam2
    uvp2 = camera.project(K, pc2r)
    oct_p2 = predict_scale(jnp.linalg.norm(pc2r, axis=-1),
                           state.mp_max_dist[jnp.clip(pids1, 0, None)],
                           sf, cfg.orb.n_levels)
    vis2 = ok1 & ~matched & (pc2r[:, 2] > 0) & camera.in_image(uvp2, bounds)
    m2 = search.search_by_projection(
        uvp2, oct_p2, state.mp_desc[jnp.clip(pids1, 0, None)], vis2,
        state.kf_uv[cand_id], state.kf_octave[cand_id],
        state.kf_desc[cand_id], state.kf_angle[cand_id],
        state.kf_kp_valid[cand_id],
        cfg.loop.sim3_search_radius * sf ** oct_p2.astype(jnp.float32),
        max_dist=cfg.match.th_high, ratio=None, oct_lo=-1, oct_hi=0)
    # two-way agreement (vnMatch1[i1]==i2 && vnMatch2[i2]==i1, :1300-1320)
    rev = jnp.concatenate([jnp.full((N,), -1, jnp.int32),
                           jnp.full((1,), -1, jnp.int32)]).at[
        jnp.where(m1.idx >= 0, m1.idx, N)].set(
        jnp.where(m1.idx >= 0, jnp.arange(N), -1))[:N]
    agree = (rev >= 0) & (m2.idx == rev)
    idx = jnp.where(matched, idx, jnp.where(agree, m2.idx, -1))
    matched = idx >= 0
    idx_s = jnp.clip(idx, 0, None)
    p2 = lie.se3_apply(T2, state.mp_pos[jnp.clip(pids2[idx_s], 0, None)])
    uv2 = state.kf_uv[cand_id][idx_s]
    sig2 = (sf ** state.kf_octave[cand_id][idx_s].astype(jnp.float32)) ** 2

    # 3. LM refinement over the enlarged set (outliers re-gated at th2=10
    # inside, like OptimizeSim3's chi2 edge removal, Optimizer.cc:1180-1230)
    S12, n_inl, _ = sim3_mod.optimize_sim3(
        rr.S12, p1, p2, uv1, uv2, matched & (rr.inliers | agree), K,
        1.0 / sig1, 1.0 / sig2, fix_scale=fix_scale,
        th2=10.0, iters=10)

    # 4. project all loop-neighborhood points into the current KF and count
    # total agreement (LoopClosing.cc:333-399)
    # S12 maps cam2 -> cam1, so Scm = S12 * T2 maps world -> current camera
    Scm = lie.sim3_compose(S12, lie.sim3_from_se3(T2))
    # loop neighborhood: candidate + its covisible
    nb2 = covisible_neighbors(state, cand_id, 10, min_weight=15)
    nb2 = jnp.concatenate([jnp.asarray(cand_id, jnp.int32)[None], nb2])
    loop_mask = jnp.zeros((M + 1,), bool)
    for i in range(nb2.shape[0]):
        obs = state.kf_obs[jnp.clip(nb2[i], 0, None)]
        pid = jnp.where((nb2[i] >= 0) & (obs >= 0), obs, M)
        loop_mask = loop_mask.at[pid].set(True)
    loop_mask = loop_mask[:M] & state.mp_valid

    pc = lie.sim3_apply(Scm, state.mp_pos)
    uvp = camera.project(K, pc)
    bounds = jnp.asarray([0.0, cfg.camera.width, 0.0, cfg.camera.height])
    vis = loop_mask & (pc[:, 2] > 0) & camera.in_image(uvp, bounds)
    # compact to fixed slots and match by projection
    P = min(2048, M)
    order = jnp.argsort(~vis)
    sel = order[:P]
    sel_ok = vis[sel]
    radius = cfg.loop.search_and_fuse_radius * \
        sf ** jnp.zeros((P,), jnp.float32)
    mres = search.search_by_projection(
        uvp[sel], jnp.zeros((P,), jnp.int32), state.mp_desc[sel], sel_ok,
        state.kf_uv[kf_id], state.kf_octave[kf_id], state.kf_desc[kf_id],
        state.kf_angle[kf_id], state.kf_kp_valid[kf_id],
        radius * 2.5, max_dist=cfg.match.th_low, ratio=None,
        oct_lo=-cfg.orb.n_levels, oct_hi=cfg.orb.n_levels)
    tgt = jnp.where(mres.idx >= 0, mres.idx, N)
    loop_pids = jnp.concatenate([jnp.full((N,), -1, jnp.int32),
                                 jnp.full((1,), -1, jnp.int32)]).at[
        tgt].set(jnp.where(mres.idx >= 0, sel, -1))[:N]
    n_total = jnp.sum((loop_pids >= 0).astype(jnp.int32))

    ok = (n_bow >= min_bow) & rr.ok & \
        (n_inl >= min_inl_gate) & \
        (n_total >= min_total)
    return ok, Scm, loop_pids, jnp.stack([n_bow, n_inl, n_total])


# ---------------------------------------------------------------------------
# correction (jit)
# ---------------------------------------------------------------------------

def correct(state: MapState, kf_id, cand_id, Scm, loop_pids,
            cfg: SLAMConfig):
    """Loop correction + essential-graph optimization (reference
    LoopClosing::CorrectLoop, LoopClosing.cc:402-585 +
    Optimizer::OptimizeEssentialGraph)."""
    K_ = state.kf_pose.shape[0]
    M = state.mp_pos.shape[0]
    fix_scale = jnp.asarray(cfg.sensor != 0)

    T_cur = state.kf_pose[kf_id]
    S_cur = lie.sim3_from_se3(T_cur)

    # current covisible group gets the correction propagated
    # (LoopClosing.cc:443-516)
    nb = covisible_neighbors(state, kf_id, 30, min_weight=15)
    group = jnp.zeros((K_,), bool).at[jnp.clip(nb, 0, None)].set(nb >= 0)
    group = group.at[kf_id].set(True)
    group = group & state.kf_valid

    S_all = jax.vmap(lie.sim3_from_se3)(state.kf_pose)       # [K, 8]
    rel = jax.vmap(lambda S: lie.sim3_compose(S, lie.sim3_inverse(S_cur)))(S_all)
    S_corr = jax.vmap(lambda r: lie.sim3_compose(r, Scm))(rel)

    # move group points: p' = S_corr_ref^-1 ( S_ref p )  per reference KF
    # (use each point's first observing group KF as its reference)
    okf = state.mp_obs_kf                                    # [M, D]
    in_group = group[jnp.clip(okf, 0, None)] & (okf >= 0)
    has_ref = jnp.any(in_group, axis=1)
    ref_slot = jnp.argmax(in_group, axis=1)
    ref_kf = jnp.clip(okf[jnp.arange(M), ref_slot], 0, None)
    S_old = S_all[ref_kf]
    S_new = S_corr[ref_kf]
    p_corr = jax.vmap(lambda so, sn, p: lie.sim3_apply(
        lie.sim3_inverse(sn), lie.sim3_apply(so, p)))(S_old, S_new, state.mp_pos)
    move = has_ref & state.mp_valid
    mp_pos = jnp.where(move[:, None], p_corr, state.mp_pos)

    # corrected group poses (SE3 from Sim3: t/s)
    pose_corr = jax.vmap(lie.sim3_to_se3)(S_corr)
    kf_pose = jnp.where(group[:, None], pose_corr, state.kf_pose)
    state = state._replace(kf_pose=kf_pose, mp_pos=mp_pos)

    # loop-point fusion: matched loop points replace current observations
    # (LoopClosing.cc:518-535)
    cur_obs = state.kf_obs[kf_id]
    have_both = (loop_pids >= 0) & (cur_obs >= 0) & (cur_obs != loop_pids)
    # dummy writes target slot M (sliced off): slot M-1 as dummy would
    # collide with a genuine fusion of point M-1 (write order undefined)
    csafe = jnp.where(have_both, cur_obs, M)
    src = jnp.full((M + 1,), -1, jnp.int32).at[csafe].set(
        jnp.where(have_both, cur_obs, -1))[:M]
    dst = jnp.full((M + 1,), -1, jnp.int32).at[csafe].set(
        jnp.where(have_both, loop_pids, -1))[:M]
    src = jnp.where(src == jnp.arange(M), src, -1)
    state = ops.replace_points(state, src, dst)
    # and add loop points to free keypoints
    add = (loop_pids >= 0) & (state.kf_obs[kf_id] < 0)
    state = ops.add_obs(state, kf_id, jnp.arange(loop_pids.shape[0]),
                        jnp.where(add, loop_pids, -1))

    # SearchAndFuse: project the loop neighborhood's points into EVERY
    # corrected-group KF, replacing conflicting observations with the loop
    # point and claiming free keypoints (reference LoopClosing.cc:587-613
    # fuses the whole CorrectedSim3 group, radius 4)
    from orb_slam2_tpu.pipeline.tracking import predict_scale
    K_cam = camera.intrinsics(cfg.camera)
    sf = cfg.orb.scale_factor
    bounds = jnp.asarray([0.0, cfg.camera.width, 0.0, cfg.camera.height])
    N = state.kf_obs.shape[1]
    nb2 = jnp.concatenate([jnp.asarray(cand_id, jnp.int32)[None],
                           covisible_neighbors(state, cand_id, 10,
                                               min_weight=15)])
    loop_mask = jnp.zeros((M + 1,), bool)
    for i in range(nb2.shape[0]):
        obs_i = state.kf_obs[jnp.clip(nb2[i], 0, None)]
        pid_i = jnp.where((nb2[i] >= 0) & (obs_i >= 0), obs_i, M)
        loop_mask = loop_mask.at[pid_i].set(True)
    loop_mask = loop_mask[:M] & state.mp_valid
    P = min(2048, M)
    _, sel = jax.lax.top_k(loop_mask.astype(jnp.int32), P)
    sel_ok = loop_mask[sel]
    gids = jnp.concatenate([jnp.asarray([kf_id], jnp.int32),
                            covisible_neighbors(state, kf_id, 7,
                                                min_weight=15)])
    for t in range(gids.shape[0]):
        g = jnp.clip(gids[t], 0, None)
        g_ok = gids[t] >= 0
        pc_g = lie.se3_apply(state.kf_pose[g], state.mp_pos[sel])
        uvp_g = camera.project(K_cam, pc_g)
        oct_g = predict_scale(jnp.linalg.norm(pc_g, axis=-1),
                              state.mp_max_dist[sel], sf, cfg.orb.n_levels)
        viz = sel_ok & g_ok & (pc_g[:, 2] > 0) & camera.in_image(uvp_g, bounds)
        mres = search.search_by_projection(
            uvp_g, oct_g, state.mp_desc[sel], viz,
            state.kf_uv[g], state.kf_octave[g], state.kf_desc[g],
            state.kf_angle[g], state.kf_kp_valid[g],
            cfg.loop.search_and_fuse_radius * sf ** oct_g.astype(jnp.float32),
            max_dist=cfg.match.th_low, ratio=None, oct_lo=-1, oct_hi=0)
        tgt_g = jnp.where(mres.idx >= 0, mres.idx, N)
        lp = jnp.concatenate([jnp.full((N,), -1, jnp.int32),
                              jnp.full((1,), -1, jnp.int32)]).at[tgt_g].set(
            jnp.where(mres.idx >= 0, sel, -1))[:N]
        curo = state.kf_obs[g]
        both = (lp >= 0) & (curo >= 0) & (curo != lp)
        cs = jnp.where(both, curo, M)  # dummy -> slot M, sliced off
        srcg = jnp.full((M + 1,), -1, jnp.int32).at[cs].set(
            jnp.where(both, curo, -1))[:M]
        dstg = jnp.full((M + 1,), -1, jnp.int32).at[cs].set(
            jnp.where(both, lp, -1))[:M]
        srcg = jnp.where(srcg == jnp.arange(M), srcg, -1)
        state = ops.replace_points(state, srcg, dstg)
        addg = (lp >= 0) & (state.kf_obs[g] < 0)
        state = ops.add_obs(state, g, jnp.arange(N),
                            jnp.where(addg, lp, -1))

    from orb_slam2_tpu.map.state import update_covisibility_for_kf
    for t in range(gids.shape[0]):
        state = update_covisibility_for_kf(
            state, jnp.clip(gids[t], 0, None))
    state = update_covisibility_for_kf(state, kf_id)
    state = state._replace(
        loop_edge=state.loop_edge.at[kf_id, cand_id].set(True)
        .at[cand_id, kf_id].set(True))

    # --- essential graph (Optimizer.cc:781-1044) ---
    S_nodes = jax.vmap(lie.sim3_from_se3)(state.kf_pose)
    # recompute current-group nodes with their *corrected Sim3* scale
    S_nodes = jnp.where(group[:, None], S_corr, S_nodes)

    E_cap = 8  # edges per KF slot: parent + loop edges + top covis
    parent = state.kf_parent
    covis_strong = jnp.where(
        state.kf_valid[:, None] & state.kf_valid[None, :],
        state.covis, 0) >= cfg.loop.essential_min_weight
    any_edge = covis_strong | state.loop_edge
    top_w, top_i = jax.lax.top_k(
        jnp.where(any_edge, state.covis + state.loop_edge * 1000, 0), E_cap - 1)

    edge_i = []
    edge_j = []
    for e in range(E_cap - 1):
        edge_i.append(jnp.arange(K_, dtype=jnp.int32))
        edge_j.append(jnp.where(top_w[:, e] > 0, top_i[:, e], -1).astype(jnp.int32))
    # spanning-tree edges
    edge_i.append(jnp.arange(K_, dtype=jnp.int32))
    edge_j.append(parent)
    ei = jnp.concatenate(edge_i)
    ej = jnp.concatenate(edge_j)
    ok_e = (ej >= 0) & state.kf_valid[jnp.clip(ei, 0, None)] & \
        state.kf_valid[jnp.clip(ej, 0, None)] & (ei != ej)
    ejs = jnp.clip(ej, 0, None)

    # measurements from the *pre-correction* relative poses (NonCorrectedSim3,
    # Optimizer.cc:847-982): S_all was captured before the group correction,
    # so edge constraints encode the drifted-but-consistent odometry geometry;
    # only the appended loop edge below carries the verified Scm measurement.
    S_meas = jax.vmap(lambda a, b: lie.sim3_compose(a, lie.sim3_inverse(b)))(
        S_all[ejs], S_all[jnp.clip(ei, 0, None)])
    # append the loop edge with the verified Sim3 measurement
    S_loop_meas = lie.sim3_compose(
        S_nodes[cand_id], lie.sim3_inverse(Scm))  # cand vs corrected current
    ei = jnp.concatenate([ei, jnp.asarray([kf_id], jnp.int32)])
    ej = jnp.concatenate([ej, jnp.asarray([cand_id], jnp.int32)])
    ejs = jnp.clip(ej, 0, None)
    S_meas = jnp.concatenate([S_meas, S_loop_meas[None]], axis=0)
    ok_e = jnp.concatenate([ok_e, jnp.asarray([True])])

    prob = posegraph.PoseGraphProblem(
        nodes=S_nodes,
        node_valid=state.kf_valid,
        node_fixed=jnp.zeros((K_,), bool).at[cand_id].set(True),
        edge_i=ei, edge_j=ejs,
        edge_meas=S_meas,
        edge_w=ok_e.astype(jnp.float32),
        fix_scale=fix_scale)
    nodes_opt, _ = posegraph.optimize_pose_graph(
        prob, n_outer=cfg.ba.ess_graph_iters, n_cg=40,
        lam0=cfg.ba.lambda_init_pose_graph + 1e-8)

    # write back: poses from optimized Sim3; points corrected via their
    # reference KF (Optimizer.cc:991-1043)
    pose_out = jax.vmap(lie.sim3_to_se3)(nodes_opt)
    kf_pose = jnp.where(state.kf_valid[:, None], pose_out, state.kf_pose)

    okf = state.mp_obs_kf
    has = okf >= 0
    ref_slot = jnp.argmax(has, axis=1)
    ref_kf2 = jnp.clip(okf[jnp.arange(M), ref_slot], 0, None)
    S_b = S_nodes[ref_kf2]
    S_a = nodes_opt[ref_kf2]
    p2 = jax.vmap(lambda sa, sb, p: lie.sim3_apply(
        lie.sim3_inverse(sa), lie.sim3_apply(sb, p)))(S_a, S_b, state.mp_pos)
    moved = jnp.any(has, 1) & state.mp_valid
    mp_pos = jnp.where(moved[:, None], p2, state.mp_pos)

    state = state._replace(kf_pose=kf_pose, mp_pos=mp_pos,
                           big_change=state.big_change + 1)
    return state

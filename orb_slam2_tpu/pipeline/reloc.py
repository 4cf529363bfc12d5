"""Relocalization: recover a lost tracker from place recognition + EPnP
(reference Tracking::Relocalization, Tracking.cc:1341-1502).

One jitted step: BoW vector -> relocalization candidates -> per-candidate
brute-force descriptor match -> batched EPnP RANSAC -> motion-only BA ->
guided-reprojection escalation (two rounds: window 10 / Hamming 100, then
window 3 / Hamming 64, re-optimizing after each top-up — reference
Tracking.cc:1449-1487) -> best candidate wins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam2_tpu.config import SLAMConfig
from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.map.state import MapState
from orb_slam2_tpu.matching import hamming, search
from orb_slam2_tpu.pipeline.frame import Frame
from orb_slam2_tpu.place import database
from orb_slam2_tpu.solvers import epnp, pose_opt


def build_reloc_step(cfg: SLAMConfig, transform):
    """transform: the vocabulary transform fn (desc, valid) -> (bow, ...)."""
    K = camera.intrinsics(cfg.camera)
    bf = cfg.camera.bf
    n_cand = 4

    def reloc(state: MapState, frame: Frame, key):
        bow, _, _ = transform(frame.desc, frame.valid)
        cands = database.detect_reloc_candidates(
            state.kf_bow, state.kf_valid, state.covis, bow, n_out=n_cand)

        N = frame.uv.shape[0]

        def try_candidate(c, sub):
            csafe = jnp.clip(c, 0, None)
            kf_pids = state.kf_obs[csafe]
            ok_row = (c >= 0) & (kf_pids >= 0) & \
                state.mp_valid[jnp.clip(kf_pids, 0, None)] & \
                state.kf_kp_valid[csafe]
            dist = hamming.hamming_matrix(state.kf_desc[csafe], frame.desc)
            res = search.match_descriptors(
                dist, jnp.ones_like(dist, bool), cfg.match.th_low,
                cfg.match.nn_ratio_reloc_bow, ok_row, frame.valid)
            idx = search.rotation_consistency(
                state.kf_angle[csafe], frame.angle, res.idx,
                cfg.match.histo_length)
            tgt = jnp.where(idx >= 0, idx, N)
            pids = jnp.concatenate([jnp.full((N,), -1, jnp.int32),
                                    jnp.full((1,), -1, jnp.int32)]).at[
                tgt].set(jnp.where(idx >= 0, kf_pids, -1))[:N]
            valid = pids >= 0
            pw = state.mp_pos[jnp.clip(pids, 0, None)]
            sig2 = (cfg.orb.scale_factor **
                    frame.octave.astype(jnp.float32)) ** 2
            rr = epnp.pnp_ransac(sub, pw, frame.uv, valid, K,
                                 cfg.pnp.th2 * sig2, iters=64,
                                 min_inliers=cfg.pnp.min_inliers)
            # refine with motion-only BA on the matched set
            inv_sigma2 = 1.0 / sig2
            opt = pose_opt.pose_optimize(
                rr.T, pw, frame.uv, frame.ur, inv_sigma2,
                valid & rr.inliers, frame.ur >= 0, K, bf, cfg.ba)
            pids_final = jnp.where(opt.inliers, pids, -1)

            # --- guided-reprojection escalation (Tracking.cc:1449-1487):
            # project the candidate KF's map points at the current estimate
            # and top up matches, then re-optimize; two rounds with
            # tightening window / descriptor gates ---
            from orb_slam2_tpu.map.state import resolve_replaced
            from orb_slam2_tpu.pipeline.tracking import predict_scale
            M = state.mp_pos.shape[0]
            kf_all = resolve_replaced(state, state.kf_obs[csafe])
            kf_safe = jnp.clip(kf_all, 0, None)
            kf_ok = ((c >= 0) & (kf_all >= 0) & state.mp_valid[kf_safe] &
                     state.kf_kp_valid[csafe])
            pw_kf = state.mp_pos[kf_safe]

            def topup(T_in, pids_in, window, max_d):
                already = jnp.zeros((M + 1,), bool).at[
                    jnp.where(pids_in >= 0, pids_in, M)].set(True)[:M]
                src_ok = kf_ok & ~already[kf_safe]
                pc = lie.se3_apply(T_in, pw_kf)
                uv_pred = camera.project(K, pc)
                bounds = jnp.asarray([0.0, cfg.camera.width,
                                      0.0, cfg.camera.height])
                src_ok = src_ok & (pc[:, 2] > 0) & \
                    camera.in_image(uv_pred, bounds)
                cam_c = -lie.quat_rotate(lie.quat_conj(T_in[:4]), T_in[4:7])
                d = jnp.linalg.norm(pw_kf - cam_c, axis=-1)
                pred = predict_scale(d, state.mp_max_dist[kf_safe],
                                     cfg.orb.scale_factor, cfg.orb.n_levels)
                radius = window * cfg.orb.scale_factor ** \
                    pred.astype(jnp.float32)
                res2 = search.search_by_projection(
                    uv_pred, pred, state.mp_desc[kf_safe], src_ok,
                    frame.uv, frame.octave, frame.desc, frame.angle,
                    frame.valid & (pids_in < 0),
                    radius, max_dist=max_d, ratio=None, oct_lo=-1, oct_hi=1)
                tgt2 = jnp.where(res2.idx >= 0, res2.idx, N)
                add = jnp.concatenate([
                    jnp.full((N,), -1, jnp.int32),
                    jnp.full((1,), -1, jnp.int32)]).at[tgt2].set(
                        jnp.where(res2.idx >= 0, kf_all, -1))[:N]
                pids_up = jnp.where(pids_in >= 0, pids_in, add)
                valid_up = pids_up >= 0
                opt_up = pose_opt.pose_optimize(
                    T_in, state.mp_pos[jnp.clip(pids_up, 0, None)],
                    frame.uv, frame.ur, inv_sigma2, valid_up,
                    frame.ur >= 0, K, bf, cfg.ba)
                return opt_up, jnp.where(opt_up.inliers, pids_up, -1)

            # round 1: window 10, ORBdist 100 (Tracking.cc:1459)
            opt_b, pids_b = topup(opt.T, pids_final, 10.0, 100)
            use_b = (opt.n_inliers < 50) & (opt.n_inliers > 10) & \
                (opt_b.n_inliers > opt.n_inliers)
            T1 = jnp.where(use_b, opt_b.T, opt.T)
            inl1 = jnp.where(use_b, opt_b.n_inliers, opt.n_inliers)
            pids1 = jnp.where(use_b, pids_b, pids_final)
            # round 2: window 3, ORBdist 64 (Tracking.cc:1472)
            opt_c, pids_c = topup(T1, pids1, 3.0, 64)
            use_c = (inl1 > 30) & (inl1 < 50) & (opt_c.n_inliers > inl1)
            T2 = jnp.where(use_c, opt_c.T, T1)
            inl2 = jnp.where(use_c, opt_c.n_inliers, inl1)
            pids2 = jnp.where(use_c, pids_c, pids1)

            good = rr.ok & (inl2 >= 50)   # Tracking.cc:1487 gate
            return good, T2, inl2, pids2

        subs = jax.random.split(key, n_cand)
        goods, Ts, n_inls, pids_all = [], [], [], []
        for i in range(n_cand):
            g, T, ni, p = try_candidate(cands.ids[i], subs[i])
            goods.append(g)
            Ts.append(T)
            n_inls.append(ni)
            pids_all.append(p)
        goods = jnp.stack(goods)
        n_inls = jnp.stack(n_inls)
        best = jnp.argmax(jnp.where(goods, n_inls, -1))
        ok = jnp.any(goods)
        return (ok, jnp.stack(Ts)[best], jnp.stack(pids_all)[best],
                jnp.where(ok, cands.ids[best], -1))

    return reloc

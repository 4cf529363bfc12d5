"""Relocalization: recover a lost tracker from place recognition + EPnP
(reference Tracking::Relocalization, Tracking.cc:1341-1502).

One jitted step: BoW vector -> relocalization candidates -> per-candidate
brute-force descriptor match -> batched EPnP RANSAC -> motion-only BA ->
best candidate wins.  The reference's iterative escalation loop
(P4P rounds + guided reprojection top-up at two window sizes) collapses into
the batched RANSAC + the dense matcher's wider gates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam2_tpu.config import SLAMConfig
from orb_slam2_tpu.core import camera
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
            good = rr.ok & (opt.n_inliers >= 50)   # Tracking.cc:1487 gate
            return good, opt.T, opt.n_inliers, pids_final

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

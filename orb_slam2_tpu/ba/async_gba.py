"""Asynchronous (chunked) global bundle adjustment.

The reference runs post-loop global BA on a transient thread with an abort
flag and merges results afterwards through `mTcwGBA` staging + spanning-tree
propagation (LoopClosing.cc:576-749, Optimizer.cc:190-235).  On a TPU there
is no second device to hide the work on, but the same effect — no
multi-second frame hitch — is achieved by *chunking*: GBA runs on a frozen
snapshot problem, a few LM iterations at a time, each chunk dispatched
between frames so the per-frame latency cost is one small jit instead of the
whole solve; tracking keeps extending the live map meanwhile.  When the
budget is exhausted, a jitted merge overwrites snapshot keyframes/points with
the optimized values and propagates corrections to everything created during
the solve via the spanning tree (exactly the reference's recovery pass,
LoopClosing.cc:676-737).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam2_tpu.config import SLAMConfig
from orb_slam2_tpu.ba.local import build_global_problem_point_major
from orb_slam2_tpu.ba.schur import ba_solve
from orb_slam2_tpu.core import lie
from orb_slam2_tpu.map.state import MapState


def merge_gba(state: MapState, ts_T, ref_kf, gba_pose, gba_points,
              snap_kf, snap_mp):
    """Fold finished-GBA results into the live map.

    snap_kf/snap_mp: validity masks at snapshot time.  Keyframes/points that
    existed then take their optimized values directly; everything created
    since is corrected through its spanning-tree parent / reference keyframe
    (LoopClosing.cc:676-737: `mTcwGBA = Tchildc * pParent->mTcwGBA`, points
    via `Twc * Xc`).  Returns (state, corrected current pose)."""
    K_ = state.kf_pose.shape[0]
    M = state.mp_pos.shape[0]
    live_pose = state.kf_pose
    in_snap = snap_kf & state.kf_valid

    par = state.kf_parent
    psafe = jnp.clip(par, 0, None)
    # child pose relative to parent, from the live (pre-merge) poses
    rel = jax.vmap(lambda a, b: lie.se3_compose(a, lie.se3_inverse(b)))(
        live_pose, live_pose[psafe])

    pose = jnp.where(in_snap[:, None], gba_pose, live_pose)

    def hop(_, p):
        prop = jax.vmap(lie.se3_compose)(rel, p[psafe])
        upd = (~in_snap) & state.kf_valid & (par >= 0)
        return jnp.where(upd[:, None], prop, p)

    # worst-case chain depth = every keyframe created during the solve
    # parenting the previous one; bound by the non-snapshot count rather
    # than a fixed constant (ADVICE r4: 8 hops could leave deep descendants
    # uncorrected).  K_ is a static bound; the loop is on-device and each
    # hop is cheap, so cap at 32 which exceeds any realistic insertion rate
    # during a chunked GBA (chunks run every frame).
    pose = jax.lax.fori_loop(0, min(32, K_), hop, pose)

    # points: snapshot points take GBA positions; newer points are corrected
    # via their first observing keyframe r: p' = Twc_new(r) * (Tcw_old(r) p)
    okf = state.mp_obs_kf
    has = okf >= 0
    ref_slot = jnp.argmax(has, axis=1)
    r = jnp.clip(okf[jnp.arange(M), ref_slot], 0, None)
    pc = jax.vmap(lie.se3_apply)(live_pose[r], state.mp_pos)
    p_corr = jax.vmap(lambda T, x: lie.se3_apply(lie.se3_inverse(T), x))(
        pose[r], pc)
    take_gba = snap_mp & state.mp_valid
    movable = jnp.any(has, 1) & state.mp_valid
    mp_pos = jnp.where(take_gba[:, None], gba_points,
                       jnp.where(movable[:, None], p_corr, state.mp_pos))

    # current tracking pose rides its reference keyframe's correction
    rk = jnp.clip(ref_kf, 0, None)
    T_new = lie.se3_compose(
        lie.se3_compose(ts_T, lie.se3_inverse(live_pose[rk])), pose[rk])

    state = state._replace(kf_pose=pose, mp_pos=mp_pos,
                           big_change=state.big_change + 1)
    return state, T_new


class AsyncGBA:
    """Host-side driver for chunked global BA (one instance per SLAM
    session).  start() snapshots the map into a frozen problem; step()
    dispatches one LM chunk (async, a few iterations); merge() folds the
    result back.  Starting again while active discards the running solve —
    the analog of the reference's `mbStopGBA` abort (LoopClosing.cc:411-423).
    """

    def __init__(self, cfg: SLAMConfig, iters_per_chunk: int = 2,
                 n_cg: int = 50):
        self.cfg = cfg
        self.iters_per_chunk = iters_per_chunk
        self.active = False

        # n_cg must keep each LM step near-exact (the reference solves the
        # reduced system exactly per iteration, Optimizer.cc:650): with weak
        # CG (15) + restarting lambda each chunk the solve stalls mid-descent
        # in a state that "unbends" the loop correction — measured WORSE ATE
        # than skipping GBA entirely.  lam is carried across chunks so the
        # chunked schedule equals one long LM run.
        def chunk(prob, cam_pose, points, lam):
            p = prob._replace(cam_pose=cam_pose, points=points)
            res = ba_solve(p, n_outer=iters_per_chunk, n_cg=n_cg,
                           lam0=lam,
                           chi2_th_mono=cfg.ba.chi2_mono,
                           chi2_th_stereo=cfg.ba.chi2_stereo)
            return res.cam_pose, res.points, res.lam

        self._chunk = jax.jit(chunk)
        self._merge = jax.jit(merge_gba)
        self._build = jax.jit(
            lambda st: (build_global_problem_point_major(st, cfg),
                        st.kf_valid, st.mp_valid))

    def start(self, state: MapState, total_iters: int):
        self.prob, self.snap_kf, self.snap_mp = self._build(state)
        self.carry = (self.prob.cam_pose, self.prob.points,
                      jnp.float32(1e-4))
        self.iters_left = total_iters
        self.active = True

    def cancel(self):
        self.active = False

    def step(self) -> bool:
        """Dispatch one chunk; returns True when the budget is exhausted and
        merge() should be called."""
        if not self.active:
            return False
        self.carry = self._chunk(self.prob, *self.carry)
        self.iters_left -= self.iters_per_chunk
        return self.iters_left <= 0

    def merge(self, state: MapState, ts_T, ref_kf):
        cam_pose, points = self.carry[0], self.carry[1]
        self.active = False
        return self._merge(state, ts_T, ref_kf, cam_pose, points,
                           self.snap_kf, self.snap_mp)

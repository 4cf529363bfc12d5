"""Local and global bundle adjustment over the map state.

Reference `Optimizer::LocalBundleAdjustment` (Optimizer.cc:453-778): variable
KFs = current KF + its covisible neighbors, variable points = everything they
observe, fixed anchor KFs = other observers of those points; after
optimization, outlier observations are erased from the map.

Here the variable/fixed partition is computed with masks and top-k over the
covisibility matrix, the solver is the dense-Schur LM (ba/schur.py
`ba_solve_dense`: the reduced camera system is materialized with one-hot
einsums + an MXU matmul and solved exactly — no CG, no scatters), and outlier
removal flows through the centralized obs bookkeeping.

Both problem builders lay observations out camera-major ([C, N] rows flattened
to R = C*N) and hand the solver the mirror-transpose index `pt_obs_r` [P, D]
derived from `mp_obs_kf/kp`, so every reduction in the solver is a reshape or
a gather.  Observations missing from the (capped) mirror get weight 0 so the
camera-side and point-side reductions see exactly the same set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam2_tpu.config import SLAMConfig
from orb_slam2_tpu.core import camera
from orb_slam2_tpu.ba.schur import BAProblem, ba_solve, ba_solve_dense
from orb_slam2_tpu.map import ops
from orb_slam2_tpu.map.state import MapState, covisible_neighbors


def _obs_weight(state: MapState, cams, cfg: SLAMConfig):
    """inv_sigma2 per (cam-slot, keypoint)."""
    oct_ = state.kf_octave[jnp.clip(cams, 0, None)]
    return (1.0 / cfg.orb.scale_factor ** 2) ** oct_.astype(jnp.float32)


def build_local_problem(state: MapState, kf_id, cfg: SLAMConfig):
    """Returns (BAProblem, pt_obs_r [P, D], cams [C], psel [P], psel_ok [P])."""
    Lv = cfg.cap.local_ba_kfs
    Lf = cfg.cap.local_ba_fixed
    K_, N = state.kf_obs.shape
    M = state.mp_pos.shape[0]
    P = min(cfg.cap.local_ba_points, M)
    D = state.mp_obs_kf.shape[1]

    nb = covisible_neighbors(state, kf_id, Lv - 1, min_weight=1)
    local = jnp.concatenate([jnp.asarray(kf_id, jnp.int32)[None], nb])   # [Lv]
    local_ok = local >= 0
    lsafe = jnp.clip(local, 0, None)

    # points observed by local KFs
    lobs = state.kf_obs[lsafe]                       # [Lv, N]
    lpid = jnp.where(local_ok[:, None] & (lobs >= 0), lobs, M)
    pmask = jnp.zeros((M + 1,), bool).at[lpid.reshape(-1)].set(True)[:M]
    pmask = pmask & state.mp_valid

    # fixed anchors: other observers of local points
    obs_kf = state.mp_obs_kf                         # [M, D]
    cand = jnp.where(pmask[:, None] & (obs_kf >= 0), obs_kf, K_)
    counts = jnp.zeros((K_ + 1,), jnp.int32).at[cand.reshape(-1)].add(1)[:K_]
    is_local_kf = jnp.zeros((K_,), bool).at[lsafe].set(local_ok)
    counts = jnp.where(is_local_kf, 0, counts)
    top_counts, fixed = jax.lax.top_k(counts, Lf)
    fixed = jnp.where(top_counts > 0, fixed, -1).astype(jnp.int32)

    cams = jnp.concatenate([local, fixed])           # [C]
    C = cams.shape[0]
    csafe = jnp.clip(cams, 0, None)
    cam_ok = cams >= 0
    is_local = jnp.arange(C) < Lv

    # gauge: keyframe 0 is immortal & fixed (reference Optimizer.cc:79,
    # KeyFrame.cc:457); also fix everything in the anchor block
    cam_var = cam_ok & is_local & (cams != 0)

    # kf id -> camera slot (first occurrence wins; cams are unique when >= 0)
    slot_of = jnp.full((K_ + 1,), -1, jnp.int32).at[
        jnp.where(cam_ok, csafe, K_)].set(
        jnp.where(cam_ok, jnp.arange(C, dtype=jnp.int32), -1))[:K_]

    # compact local points into P slots
    _, psel = jax.lax.top_k(pmask.astype(jnp.int32), P)          # [P]
    psel_ok = pmask[psel]
    inv_sel = jnp.full((M + 1,), -1, jnp.int32).at[
        jnp.where(psel_ok, psel, M)].set(
        jnp.where(psel_ok, jnp.arange(P, dtype=jnp.int32), -1))[:M]

    rows = state.kf_obs[csafe]                       # [C, N]
    pid_l = inv_sel[jnp.clip(rows, 0, None)]         # local point slot
    active = (cam_ok[:, None] & (rows >= 0) & (pid_l >= 0) &
              state.kf_kp_valid[csafe])
    pid_l = jnp.where(active, pid_l, 0)

    # mirror transpose: per local point, observation row indices
    okf = state.mp_obs_kf[psel]                      # [P, D]
    okp = state.mp_obs_kp[psel]
    oslot = slot_of[jnp.clip(okf, 0, None)]          # [P, D] cam slot or -1
    mir_ok = psel_ok[:, None] & (okf >= 0) & (oslot >= 0)
    r_idx = jnp.clip(oslot, 0, None) * N + jnp.clip(okp, 0, None)
    mir_ok = mir_ok & active[jnp.clip(oslot, 0, None),
                             jnp.clip(okp, 0, None)]
    pt_obs_r = jnp.where(mir_ok, r_idx, -1)

    # only mirror-covered observations carry weight (solver requirement)
    R = C * N
    member = jnp.zeros((R + 1,), bool).at[
        jnp.where(mir_ok, r_idx, R)].set(True)[:R]
    w = jnp.where(active, _obs_weight(state, cams, cfg), 0.0).reshape(-1)
    w = jnp.where(member, w, 0.0)

    prob = BAProblem(
        cam_pose=state.kf_pose[csafe],
        cam_var=cam_var,
        points=state.mp_pos[psel],
        pt_var=psel_ok,
        obs_cam=jnp.broadcast_to(jnp.arange(C)[:, None], (C, N)).reshape(-1),
        obs_pid=pid_l.reshape(-1),
        obs_uv=state.kf_uv[csafe].reshape(-1, 2),
        obs_ur=state.kf_ur[csafe].reshape(-1),
        obs_w=w,
        K=camera.intrinsics(cfg.camera),
        bf=jnp.asarray(cfg.camera.bf, jnp.float32),
    )
    return prob, pt_obs_r, cams, psel, psel_ok


def local_ba(state: MapState, kf_id, cfg: SLAMConfig,
             n_outer: int = 10, n_cg: int = 30, lam0=1e-4,
             return_lam: bool = False):
    """Run local BA and write results + outlier removal back into the map.
    (`n_cg` kept for API compatibility; the dense solver does exact steps.)

    With `return_lam=True` returns (state, final LM damping) so chunked
    schedules (pipeline/system.py mapping stages) can resume where the
    previous chunk stopped."""
    prob, pt_obs_r, cams, psel, psel_ok = build_local_problem(state, kf_id, cfg)
    N = state.kf_obs.shape[1]
    res = ba_solve_dense(prob, pt_obs_r, n_per_cam=N, n_outer=n_outer,
                         lam0=lam0,
                         chi2_th_mono=cfg.ba.chi2_mono,
                         chi2_th_stereo=cfg.ba.chi2_stereo)

    # write back variable cameras (masked merge over all K)
    C = cams.shape[0]
    csafe = jnp.clip(cams, 0, None)
    upd_cam = prob.cam_var
    K_ = state.kf_pose.shape[0]
    M = state.mp_pos.shape[0]
    pose_buf = jnp.zeros((K_ + 1, 7), state.kf_pose.dtype)
    hit = jnp.zeros((K_ + 1,), bool)
    tgt = jnp.where(upd_cam, csafe, K_)
    pose_buf = pose_buf.at[tgt].set(res.cam_pose)
    hit = hit.at[tgt].set(upd_cam)
    kf_pose = jnp.where(hit[:K_, None], pose_buf[:K_], state.kf_pose)

    ptgt = jnp.where(psel_ok, psel, M)
    mp_pos = jnp.concatenate([state.mp_pos, jnp.zeros((1, 3))]).at[
        ptgt].set(res.points)[:M]
    state = state._replace(kf_pose=kf_pose, mp_pos=mp_pos)

    # erase outlier observations (reference Optimizer.cc:711-757)
    bad = ((prob.obs_w > 0) & ~res.inlier).reshape(C, N)
    removal = jnp.zeros((K_ + 1, N), bool).at[
        jnp.where(cams >= 0, csafe, K_)].max(bad)[:K_]
    state = ops.remove_obs_global(state, removal)
    if return_lam:
        return state, res.lam
    return state


def build_global_problem_point_major(state: MapState, cfg: SLAMConfig
                                     ) -> BAProblem:
    """Global BA problem in point-major layout: one observation row per
    (point, observer-slot) pair of the mirror table `mp_obs_kf/kp`, R = M*D.

    At KITTI capacity (M=131k, D=16 -> R=2.1M rows) this is ~10x fewer rows
    than the camera-major K*N grid (2048*2048=4.2M, mostly empty) and — more
    importantly — it is the layout the landmark-sharded distributed solver
    partitions: contiguous row blocks follow their owning points, so the
    point-side reductions are device-local (owner-computed Schur, SURVEY.md
    §2.5), matching g2o's landmark marginalization (block_solver.h:132-172).
    """
    K_, N = state.kf_obs.shape
    M, D = state.mp_obs_kf.shape
    okf, okp = state.mp_obs_kf, state.mp_obs_kp
    ks, ps = jnp.clip(okf, 0, None), jnp.clip(okp, 0, None)
    active = (state.mp_valid[:, None] & (okf >= 0) & state.kf_valid[ks] &
              state.kf_kp_valid[ks, ps] & (state.kf_obs[ks, ps] >= 0))
    oct_ = state.kf_octave[ks, ps]
    w = jnp.where(active,
                  (1.0 / cfg.orb.scale_factor ** 2) ** oct_.astype(jnp.float32),
                  0.0)
    return BAProblem(
        cam_pose=state.kf_pose,
        cam_var=state.kf_valid & (jnp.arange(K_) != 0),
        points=state.mp_pos,
        pt_var=state.mp_valid,
        obs_cam=ks.reshape(-1),
        obs_pid=jnp.broadcast_to(jnp.arange(M)[:, None], (M, D)).reshape(-1),
        obs_uv=state.kf_uv[ks, ps].reshape(-1, 2),
        obs_ur=jnp.where(active, state.kf_ur[ks, ps], -1.0).reshape(-1),
        obs_w=w.reshape(-1),
        K=camera.intrinsics(cfg.camera),
        bf=jnp.asarray(cfg.camera.bf, jnp.float32))


def global_ba_cg(state: MapState, cfg: SLAMConfig, n_outer: int = 10,
                 n_cg: int = 50) -> MapState:
    """Full-map BA via the matrix-free CG solver on the point-major problem.
    Scales to KITTI capacities (C=2048 cameras) where materializing the
    [6C, 6C] reduced system of `ba_solve_dense` (12288^2 floats) is
    infeasible; memory here is O(R) rows + O(C) blocks."""
    prob = build_global_problem_point_major(state, cfg)
    res = ba_solve(prob, n_outer=n_outer, n_cg=n_cg,
                   chi2_th_mono=cfg.ba.chi2_mono,
                   chi2_th_stereo=cfg.ba.chi2_stereo)
    kf_pose = jnp.where(prob.cam_var[:, None], res.cam_pose, state.kf_pose)
    mp_pos = jnp.where(state.mp_valid[:, None], res.points, state.mp_pos)
    return state._replace(kf_pose=kf_pose, mp_pos=mp_pos)


# Above this camera count, global BA routes through the matrix-free CG path
# (dense reduced system would be [6C, 6C]).
_GLOBAL_DENSE_MAX_CAMS = 256


def global_ba(state: MapState, cfg: SLAMConfig, n_outer: int = 10,
              n_cg: int = 50) -> MapState:
    """Full-map BA (reference Optimizer::GlobalBundleAdjustemnt,
    Optimizer.cc:41-237): all valid KFs variable except KF 0."""
    if state.kf_obs.shape[0] > _GLOBAL_DENSE_MAX_CAMS:
        return global_ba_cg(state, cfg, n_outer=n_outer, n_cg=n_cg)
    K_, N = state.kf_obs.shape
    M = state.mp_pos.shape[0]
    D = state.mp_obs_kf.shape[1]
    cams = jnp.arange(K_, dtype=jnp.int32)
    cam_ok = state.kf_valid
    cam_var = cam_ok & (cams != 0)
    rows = state.kf_obs
    pid = jnp.clip(rows, 0, None)
    active = (cam_ok[:, None] & (rows >= 0) & state.mp_valid[pid] &
              state.kf_kp_valid)
    # mirror transpose over the full map
    okf, okp = state.mp_obs_kf, state.mp_obs_kp
    mir_ok = state.mp_valid[:, None] & (okf >= 0) & \
        cam_ok[jnp.clip(okf, 0, None)]
    r_idx = jnp.clip(okf, 0, None) * N + jnp.clip(okp, 0, None)
    mir_ok = mir_ok & active[jnp.clip(okf, 0, None), jnp.clip(okp, 0, None)]
    pt_obs_r = jnp.where(mir_ok, r_idx, -1)
    R = K_ * N
    member = jnp.zeros((R + 1,), bool).at[
        jnp.where(mir_ok, r_idx, R)].set(True)[:R]
    w = jnp.where(active, _obs_weight(state, cams, cfg), 0.0).reshape(-1)
    w = jnp.where(member, w, 0.0)
    prob = BAProblem(
        cam_pose=state.kf_pose, cam_var=cam_var,
        points=state.mp_pos, pt_var=state.mp_valid,
        obs_cam=jnp.broadcast_to(jnp.arange(K_)[:, None], (K_, N)).reshape(-1),
        obs_pid=pid.reshape(-1),
        obs_uv=state.kf_uv.reshape(-1, 2),
        obs_ur=state.kf_ur.reshape(-1),
        obs_w=w,
        K=camera.intrinsics(cfg.camera),
        bf=jnp.asarray(cfg.camera.bf, jnp.float32))
    res = ba_solve_dense(prob, pt_obs_r, n_per_cam=N, n_outer=n_outer,
                         chi2_th_mono=cfg.ba.chi2_mono,
                         chi2_th_stereo=cfg.ba.chi2_stereo)
    kf_pose = jnp.where(cam_var[:, None], res.cam_pose, state.kf_pose)
    mp_pos = jnp.where(state.mp_valid[:, None], res.points, state.mp_pos)
    return state._replace(kf_pose=kf_pose, mp_pos=mp_pos)

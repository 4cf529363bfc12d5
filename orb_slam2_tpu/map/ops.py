"""Map mutation primitives: the pure-functional replacements of the
reference's KeyFrame/MapPoint lifecycle methods.

Every change to the keypoint->point association goes through `add_obs` /
`remove_obs` / `cull_points` / `replace_points`, which keep `kf_obs` (the
source of truth) and the capped per-point observer mirror `mp_obs_kf/kp`
consistent — the invariant the reference maintains manually across
`MapPoint::AddObservation/EraseObservation/SetBadFlag/Replace`
(MapPoint.cc:98-215).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam2_tpu.map.state import MapState
from orb_slam2_tpu.matching import hamming


# ---------------------------------------------------------------------------
# allocation
# ---------------------------------------------------------------------------

def alloc_points(state: MapState, want: jnp.ndarray, pos: jnp.ndarray,
                 desc: jnp.ndarray, first_kf) -> tuple:
    """Allocate map points for rows where want[i] (append-only slab).

    want: [R] bool, pos: [R, 3], desc: [R, 32].
    Returns (state, pids [R] i32 with -1 where not allocated).
    """
    M = state.mp_pos.shape[0]
    offs = jnp.cumsum(want.astype(jnp.int32)) - 1
    pids = jnp.where(want, state.next_mp + offs, -1)
    ok = want & (pids < M)
    pids = jnp.where(ok, pids, -1)
    slot = jnp.where(ok, pids, M)  # scatter-to-void for non-allocated
    pos_p = jnp.concatenate([state.mp_pos, jnp.zeros((1, 3), state.mp_pos.dtype)])
    desc_p = jnp.concatenate([state.mp_desc, jnp.zeros((1, 32), jnp.uint8)])
    valid_p = jnp.concatenate([state.mp_valid, jnp.zeros((1,), bool)])
    first_p = jnp.concatenate([state.mp_first_kf, jnp.full((1,), -1, jnp.int32)])
    pos_p = pos_p.at[slot].set(pos)
    desc_p = desc_p.at[slot].set(desc)
    valid_p = valid_p.at[slot].set(True)
    first_p = first_p.at[slot].set(jnp.asarray(first_kf, jnp.int32))
    n_new = jnp.sum(ok.astype(jnp.int32))
    vis_p = jnp.concatenate([state.mp_visible, jnp.zeros((1,), jnp.int32)])
    fnd_p = jnp.concatenate([state.mp_found, jnp.zeros((1,), jnp.int32)])
    rep_p = jnp.concatenate([state.mp_replaced, jnp.zeros((1,), jnp.int32)])
    vis_p = vis_p.at[slot].set(1)
    fnd_p = fnd_p.at[slot].set(1)
    rep_p = rep_p.at[slot].set(-1)
    state = state._replace(
        mp_pos=pos_p[:M], mp_desc=desc_p[:M], mp_valid=valid_p[:M],
        mp_first_kf=first_p[:M], mp_visible=vis_p[:M], mp_found=fnd_p[:M],
        mp_replaced=rep_p[:M],
        next_mp=state.next_mp + n_new)
    return state, pids


# ---------------------------------------------------------------------------
# observations
# ---------------------------------------------------------------------------

def add_obs(state: MapState, kf_id, kp_idx: jnp.ndarray,
            pids: jnp.ndarray) -> MapState:
    """Register observations (kf_id, kp_idx[i]) -> pids[i] for pids >= 0.

    kp_idx, pids: [R].  Each point may appear at most once per call (one KF).
    """
    M, D = state.mp_obs_kf.shape
    ok = pids >= 0
    kf_row = state.kf_obs[kf_id]
    kf_row = kf_row.at[jnp.clip(kp_idx, 0, None)].set(
        jnp.where(ok, pids, kf_row[jnp.clip(kp_idx, 0, None)]))
    kf_obs = state.kf_obs.at[kf_id].set(kf_row)
    # mirror: first free slot per point
    free = state.mp_obs_kf < 0                       # [M, D]
    first_free = jnp.argmax(free, axis=1)            # [M]
    has_free = jnp.any(free, axis=1)
    p = jnp.where(ok, pids, M)
    slot = first_free[jnp.clip(p, 0, M - 1)]
    write = ok & has_free[jnp.clip(p, 0, M - 1)]
    obs_kf_p = jnp.concatenate([state.mp_obs_kf,
                                jnp.full((1, D), -1, jnp.int32)])
    obs_kp_p = jnp.concatenate([state.mp_obs_kp,
                                jnp.full((1, D), -1, jnp.int32)])
    pr = jnp.where(write, p, M)
    obs_kf_p = obs_kf_p.at[pr, slot].set(
        jnp.where(write, jnp.asarray(kf_id, jnp.int32), -1))
    obs_kp_p = obs_kp_p.at[pr, slot].set(jnp.where(write, kp_idx, -1))
    return state._replace(kf_obs=kf_obs, mp_obs_kf=obs_kf_p[:M],
                          mp_obs_kp=obs_kp_p[:M])


def add_obs_multi(state: MapState, kf_ids: jnp.ndarray, kp_idx: jnp.ndarray,
                  pids: jnp.ndarray) -> MapState:
    """Register observations (kf_ids[i], kp_idx[i]) -> pids[i] for pids >= 0
    across MANY keyframes in one scatter pass.

    Requirements:
      * (kf, kp) pairs are unique among active rows;
      * each point id appears at most once (one new observation per point
        per call) — the mirror table allocates a single free slot per point.

    Used by triangulation to register all neighbor-side observations in one
    scatter (r5; the earlier over-culling interaction this caused in r4 was
    resolved by the subpixel frontend + GBA convergence fixes — e2e gates
    now pass with the denser covisibility).
    """
    K_, N = state.kf_obs.shape
    M, D = state.mp_obs_kf.shape
    ok = (pids >= 0) & (kf_ids >= 0)
    flat = jnp.where(ok, jnp.clip(kf_ids, 0, None) * N +
                     jnp.clip(kp_idx, 0, None), K_ * N)
    kf_obs = jnp.concatenate(
        [state.kf_obs.reshape(-1), jnp.full((1,), -1, jnp.int32)]).at[
        flat].set(jnp.where(ok, pids, -1))[:K_ * N].reshape(K_, N)
    # mirror: one free slot per point
    free = state.mp_obs_kf < 0
    first_free = jnp.argmax(free, axis=1)
    has_free = jnp.any(free, axis=1)
    p = jnp.where(ok, pids, M)
    slot = first_free[jnp.clip(p, 0, M - 1)]
    write = ok & has_free[jnp.clip(p, 0, M - 1)]
    pr = jnp.where(write, p, M)
    obs_kf_p = jnp.concatenate([state.mp_obs_kf,
                                jnp.full((1, D), -1, jnp.int32)])
    obs_kp_p = jnp.concatenate([state.mp_obs_kp,
                                jnp.full((1, D), -1, jnp.int32)])
    obs_kf_p = obs_kf_p.at[pr, slot].set(jnp.where(write, kf_ids, -1))
    obs_kp_p = obs_kp_p.at[pr, slot].set(jnp.where(write, kp_idx, -1))
    return state._replace(kf_obs=kf_obs, mp_obs_kf=obs_kf_p[:M],
                          mp_obs_kp=obs_kp_p[:M])


def remove_obs_global(state: MapState, removal: jnp.ndarray) -> MapState:
    """Remove observations where removal [K, N] is True (e.g. BA outliers,
    reference Optimizer.cc:711-757), updating both kf_obs and the mirror."""
    kf_obs = jnp.where(removal, -1, state.kf_obs)
    okf, okp = state.mp_obs_kf, state.mp_obs_kp
    slot_ok = okf >= 0
    clear = slot_ok & removal[jnp.clip(okf, 0, None), jnp.clip(okp, 0, None)]
    return state._replace(
        kf_obs=kf_obs,
        mp_obs_kf=jnp.where(clear, -1, okf),
        mp_obs_kp=jnp.where(clear, -1, okp))


def remove_obs(state: MapState, kf_id, kp_mask: jnp.ndarray) -> MapState:
    """Remove the observations of keyframe kf_id at keypoints where kp_mask."""
    K_, N = state.kf_obs.shape
    removal = jnp.zeros((K_, N), bool).at[kf_id].set(kp_mask)
    return remove_obs_global(state, removal)


def cull_points(state: MapState, bad: jnp.ndarray) -> MapState:
    """Invalidate points where bad [M]; remove them from every keyframe's
    observation row (reference MapPoint::SetBadFlag, MapPoint.cc:151-168 —
    but actually freeing the slot, unlike the reference's leak, §2.6)."""
    obs = state.kf_obs
    is_bad = bad[jnp.clip(obs, 0, None)] & (obs >= 0)
    return state._replace(
        kf_obs=jnp.where(is_bad, -1, obs),
        mp_valid=state.mp_valid & ~bad,
        mp_obs_kf=jnp.where(bad[:, None], -1, state.mp_obs_kf),
        mp_obs_kp=jnp.where(bad[:, None], -1, state.mp_obs_kp))


def replace_points(state: MapState, src: jnp.ndarray,
                   dst: jnp.ndarray) -> MapState:
    """Fuse: forward every src point id to its dst (reference
    MapPoint::Replace, MapPoint.cc:177-215).  src/dst: [M] aligned arrays
    where src[i] >= 0 means point i is replaced by dst[i].

    All kf_obs references to i are rewritten to dst[i]; i is invalidated.
    Counters are merged.  Existing forwarding chains are collapsed by
    rewriting mp_replaced targets."""
    M = state.mp_pos.shape[0]
    fwd = jnp.where(src >= 0, dst, -1)              # [M]
    # rewrite kf_obs
    obs = state.kf_obs
    t = fwd[jnp.clip(obs, 0, None)]
    new_obs = jnp.where((obs >= 0) & (t >= 0), t, obs)
    # merge counters into dst
    vis_add = jnp.zeros((M + 1,), jnp.int32).at[
        jnp.where(fwd >= 0, fwd, M)].add(state.mp_visible)
    fnd_add = jnp.zeros((M + 1,), jnp.int32).at[
        jnp.where(fwd >= 0, fwd, M)].add(state.mp_found)
    # collapse chains: anything forwarding to a now-replaced point forwards on
    old_fwd = state.mp_replaced
    collapsed = jnp.where((old_fwd >= 0) & (fwd[jnp.clip(old_fwd, 0, None)] >= 0),
                          fwd[jnp.clip(old_fwd, 0, None)], old_fwd)
    new_replaced = jnp.where(fwd >= 0, fwd, collapsed)
    replaced_mask = fwd >= 0
    state = state._replace(
        kf_obs=new_obs,
        mp_valid=state.mp_valid & ~replaced_mask,
        mp_visible=state.mp_visible + vis_add[:M],
        mp_found=state.mp_found + fnd_add[:M],
        mp_replaced=new_replaced,
        mp_obs_kf=jnp.where(replaced_mask[:, None], -1, state.mp_obs_kf),
        mp_obs_kp=jnp.where(replaced_mask[:, None], -1, state.mp_obs_kp))
    return state


# ---------------------------------------------------------------------------
# derived point attributes
# ---------------------------------------------------------------------------

def update_point_attributes(state: MapState, pmask: jnp.ndarray,
                            scale_factor: float, n_levels: int,
                            cap: int = 4096) -> MapState:
    """Recompute distinctive descriptor, normal and scale band for points in
    pmask, from their observer table (reference
    MapPoint::ComputeDistinctiveDescriptors MapPoint.cc:242-307 and
    UpdateNormalAndDepth MapPoint.cc:330-371).

    The touched points are first compacted into `cap` slots so the pairwise-
    descriptor einsum runs over [cap, D], not the full point capacity — the
    reference recomputes per touched point, not over the whole map.  If more
    than `cap` points are flagged the overflow keeps stale attributes until
    the next refresh (harmless: these are search heuristics)."""
    M, D = state.mp_obs_kf.shape
    T = min(cap, M)
    _, sel = jax.lax.top_k(pmask.astype(jnp.int32), T)   # touched ids [T]
    sel_ok = pmask[sel]

    okf = state.mp_obs_kf[sel]        # [T, D]
    okp = state.mp_obs_kp[sel]
    pos = state.mp_pos[sel]           # [T, 3]
    has = (okf >= 0) & sel_ok[:, None]
    kf_safe = jnp.clip(okf, 0, None)
    kp_safe = jnp.clip(okp, 0, None)

    # gather observation descriptors [T, D, 32]
    descs = state.kf_desc[kf_safe, kp_safe]
    # pairwise Hamming among the D observations of each point
    from orb_slam2_tpu.frontend.orb import unpack_bits
    bits = unpack_bits(descs.reshape(-1, 32)).reshape(T, D, 256)
    pm1 = jnp.where(bits, 1.0, -1.0).astype(jnp.bfloat16)
    dots = jnp.einsum('mdb,meb->mde', pm1, pm1,
                      preferred_element_type=jnp.float32)
    dist = (256.0 - dots) * 0.5
    pair_ok = has[:, :, None] & has[:, None, :]
    dist = jnp.where(pair_ok, dist, 0.0)
    cnt = jnp.maximum(jnp.sum(has, 1), 1)[:, None]
    # reference takes min median; mean of valid distances is the smooth
    # equivalent and identical in the common small-D regime
    mean_d = jnp.sum(dist, -1) / cnt
    mean_d = jnp.where(has, mean_d, jnp.inf)
    best = jnp.argmin(mean_d, axis=1)
    new_desc = descs[jnp.arange(T), best]
    # normal: mean of unit vectors from KF centers to point
    kf_q = state.kf_pose[kf_safe, :4]
    kf_t = state.kf_pose[kf_safe, 4:7]
    # camera center C = -R^T t
    from orb_slam2_tpu.core import lie
    centers = -lie.quat_rotate(lie.quat_conj(kf_q.reshape(-1, 4)),
                               kf_t.reshape(-1, 3)).reshape(T, D, 3)
    vec = pos[:, None, :] - centers
    nrm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    unit = jnp.where(has[..., None], vec / jnp.maximum(nrm, 1e-9), 0.0)
    normal = jnp.sum(unit, 1) / jnp.maximum(jnp.sum(has, 1), 1)[:, None]
    # scale band from the reference observation (first_kf's obs if present,
    # else slot 0): dist * scale^octave
    ref_slot = jnp.argmax(has, axis=1)
    ref_kf = kf_safe[jnp.arange(T), ref_slot]
    ref_kp = kp_safe[jnp.arange(T), ref_slot]
    d_ref = jnp.linalg.norm(
        pos - (-lie.quat_rotate(lie.quat_conj(state.kf_pose[ref_kf, :4]),
                                state.kf_pose[ref_kf, 4:7])), axis=-1)
    octv = state.kf_octave[ref_kf, ref_kp]
    level_sf = scale_factor ** octv.astype(jnp.float32)
    max_dist = d_ref * level_sf
    min_dist = max_dist / (scale_factor ** (n_levels - 1))

    upd = sel_ok & jnp.any(has, 1)
    tgt = jnp.where(upd, sel, M)     # scatter-to-void for untouched rows
    pad = lambda a: jnp.concatenate([a, jnp.zeros_like(a[:1])])
    mp_desc = pad(state.mp_desc).at[tgt].set(new_desc)[:M]
    mp_normal = pad(state.mp_normal).at[tgt].set(normal)[:M]
    mp_max = pad(state.mp_max_dist).at[tgt].set(max_dist)[:M]
    mp_min = pad(state.mp_min_dist).at[tgt].set(min_dist)[:M]
    return state._replace(mp_desc=mp_desc, mp_normal=mp_normal,
                          mp_max_dist=mp_max, mp_min_dist=mp_min)


# ---------------------------------------------------------------------------
# keyframe insertion
# ---------------------------------------------------------------------------

def insert_keyframe(state: MapState, frame, pose: jnp.ndarray,
                    obs_pids: jnp.ndarray):
    """Append a keyframe built from a tracked frame (reference
    Tracking::CreateNewKeyFrame Tracking.cc:1063-1141 + KeyFrame ctor
    KeyFrame.cc:31-57 + UpdateConnections).

    obs_pids: [N] map-point id tracked at each keypoint (-1 none).
    Returns (state, kf_id).  Caller must check kf capacity on host.
    """
    from orb_slam2_tpu.map.state import (spanning_parent_for_kf,
                                         update_covisibility_for_kf)
    k = state.next_kf
    state = state._replace(
        kf_pose=state.kf_pose.at[k].set(pose),
        kf_valid=state.kf_valid.at[k].set(True),
        kf_frame_id=state.kf_frame_id.at[k].set(frame.frame_id),
        kf_timestamp=state.kf_timestamp.at[k].set(frame.timestamp),
        kf_uv=state.kf_uv.at[k].set(frame.uv),
        kf_ur=state.kf_ur.at[k].set(frame.ur),
        kf_depth=state.kf_depth.at[k].set(frame.depth),
        kf_octave=state.kf_octave.at[k].set(frame.octave),
        kf_angle=state.kf_angle.at[k].set(frame.angle),
        kf_desc=state.kf_desc.at[k].set(frame.desc),
        kf_kp_valid=state.kf_kp_valid.at[k].set(frame.valid),
        kf_obs=state.kf_obs.at[k].set(-1),
        next_kf=state.next_kf + 1)
    n = frame.uv.shape[0]
    state = add_obs(state, k, jnp.arange(n), jnp.where(frame.valid, obs_pids, -1))
    state = update_covisibility_for_kf(state, k)
    parent = spanning_parent_for_kf(state, k)
    state = state._replace(kf_parent=state.kf_parent.at[k].set(parent))
    return state, k

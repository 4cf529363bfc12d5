"""The map as a fixed-capacity pytree of structure-of-arrays.

Replaces the reference's pointer graph — `Map` (keyframe/point sets under
mutexes, Map.h:62-80), `KeyFrame` (KeyFrame.h), `MapPoint` (MapPoint.h) — with
flat arrays indexed by stable integer ids.  Pointer identity becomes a slot
index; `isBad` becomes a validity bitmap; `MapPoint::Replace` becomes a
forwarding array (`mp_replaced`, mirroring mpReplaced MapPoint.h:138); the
covisibility graph is a dense [K, K] weight matrix recomputed incrementally
from the observation table.

All updates are pure functions `state' = f(state, ...)` — the design removes
the reference's ~20-mutex locking protocol (SURVEY.md §2.5 P5) entirely.

Keypoint-to-point association is the single source of truth: `kf_obs[k, n]`
holds the map-point id observed by keypoint n of keyframe k (-1 if none).
Everything else (point observation counts, covisibility, spanning tree) is
derived from it, so the two-sided consistency bugs the reference guards
against with `EraseObservation`/`SetBadFlag` interplay cannot occur.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import SLAMConfig


class MapState(NamedTuple):
    # --- keyframes (capacity K) ---
    kf_pose: jnp.ndarray      # [K, 7] SE3 Tcw
    kf_valid: jnp.ndarray     # [K] bool (false = never allocated or culled)
    kf_frame_id: jnp.ndarray  # [K] i32 source frame index
    kf_timestamp: jnp.ndarray  # [K] f32
    kf_parent: jnp.ndarray    # [K] i32 spanning-tree parent (-1 root)
    kf_pose_rel: jnp.ndarray  # [K, 7] pose relative to parent at cull time
    # --- per-keyframe keypoints (capacity K x N) ---
    kf_uv: jnp.ndarray        # [K, N, 2] undistorted pixel coords
    kf_ur: jnp.ndarray        # [K, N] stereo right-u (-1 if mono/no depth)
    kf_depth: jnp.ndarray     # [K, N] depth (-1 unknown)
    kf_octave: jnp.ndarray    # [K, N] i32
    kf_angle: jnp.ndarray     # [K, N] f32
    kf_desc: jnp.ndarray      # [K, N, 32] u8
    kf_kp_valid: jnp.ndarray  # [K, N] bool
    kf_obs: jnp.ndarray       # [K, N] i32 map-point id (-1 none)
    # --- covisibility ---
    covis: jnp.ndarray        # [K, K] i32 shared-observation counts
    loop_edge: jnp.ndarray    # [K, K] bool loop-closure edges
    # --- place recognition ---
    kf_bow: jnp.ndarray       # [K, W] f32 L1-normalized TF-IDF BoW vectors
    # --- map points (capacity M) ---
    mp_pos: jnp.ndarray       # [M, 3]
    mp_valid: jnp.ndarray     # [M] bool
    mp_desc: jnp.ndarray      # [M, 32] u8 distinctive descriptor
    mp_normal: jnp.ndarray    # [M, 3] mean viewing direction
    mp_min_dist: jnp.ndarray  # [M] scale-invariance band
    mp_max_dist: jnp.ndarray  # [M]
    mp_first_kf: jnp.ndarray  # [M] i32
    mp_visible: jnp.ndarray   # [M] i32 tracking visibility counter
    mp_found: jnp.ndarray     # [M] i32 tracking found counter
    mp_replaced: jnp.ndarray  # [M] i32 forwarding id (-1 = live)
    # capped per-point observer table (derived mirror of kf_obs; D slots)
    mp_obs_kf: jnp.ndarray    # [M, D] i32 keyframe id (-1 free slot)
    mp_obs_kp: jnp.ndarray    # [M, D] i32 keypoint index within that KF
    # --- counters ---
    next_kf: jnp.ndarray      # i32 next keyframe slot
    next_mp: jnp.ndarray      # i32 next map-point slot
    big_change: jnp.ndarray   # i32 InformNewBigChange counter (Map.h:77)

    @property
    def n_kf(self):
        return jnp.sum(self.kf_valid.astype(jnp.int32))

    @property
    def n_mp(self):
        return jnp.sum(self.mp_valid.astype(jnp.int32))


def empty_map(cfg: SLAMConfig) -> MapState:
    K = cfg.cap.max_keyframes
    N = cfg.cap.max_obs_per_kf
    M = cfg.cap.max_points
    f32, i32 = jnp.float32, jnp.int32
    pose0 = jnp.zeros((K, 7), f32).at[:, 0].set(1.0)
    return MapState(
        kf_pose=pose0,
        kf_valid=jnp.zeros((K,), bool),
        kf_frame_id=jnp.full((K,), -1, i32),
        kf_timestamp=jnp.zeros((K,), f32),
        kf_parent=jnp.full((K,), -1, i32),
        kf_pose_rel=pose0,
        kf_uv=jnp.zeros((K, N, 2), f32),
        kf_ur=jnp.full((K, N), -1.0, f32),
        kf_depth=jnp.full((K, N), -1.0, f32),
        kf_octave=jnp.zeros((K, N), i32),
        kf_angle=jnp.zeros((K, N), f32),
        kf_desc=jnp.zeros((K, N, 32), jnp.uint8),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_obs=jnp.full((K, N), -1, i32),
        covis=jnp.zeros((K, K), i32),
        loop_edge=jnp.zeros((K, K), bool),
        kf_bow=jnp.zeros(
            (K, cfg.vocab.branching ** cfg.vocab.depth), jnp.float32),
        mp_pos=jnp.zeros((M, 3), f32),
        mp_valid=jnp.zeros((M,), bool),
        mp_desc=jnp.zeros((M, 32), jnp.uint8),
        mp_normal=jnp.zeros((M, 3), f32),
        mp_min_dist=jnp.zeros((M,), f32),
        mp_max_dist=jnp.zeros((M,), f32),
        mp_first_kf=jnp.full((M,), -1, i32),
        mp_visible=jnp.ones((M,), i32),
        mp_found=jnp.ones((M,), i32),
        mp_replaced=jnp.full((M,), -1, i32),
        mp_obs_kf=jnp.full((M, cfg.cap.max_obs_per_point), -1, i32),
        mp_obs_kp=jnp.full((M, cfg.cap.max_obs_per_point), -1, i32),
        next_kf=jnp.asarray(0, i32),
        next_mp=jnp.asarray(0, i32),
        big_change=jnp.asarray(0, i32),
    )


# ---------------------------------------------------------------------------
# derived quantities
# ---------------------------------------------------------------------------

def point_obs_count(state: MapState) -> jnp.ndarray:
    """[M] number of keyframe observations per point (derived from kf_obs;
    replaces MapPoint::Observations())."""
    M = state.mp_pos.shape[0]
    obs = state.kf_obs
    pid = jnp.where(state.kf_valid[:, None] & (obs >= 0), obs, M)
    cnt = jnp.zeros((M + 1,), jnp.int32).at[pid.reshape(-1)].add(1)
    return cnt[:M]


def weighted_obs_count(state: MapState) -> jnp.ndarray:
    """[M] nObs with stereo observations counted twice (reference
    MapPoint::AddObservation, MapPoint.cc:105-109)."""
    okf, okp = state.mp_obs_kf, state.mp_obs_kp
    ok = okf >= 0
    ur = state.kf_ur[jnp.clip(okf, 0, None), jnp.clip(okp, 0, None)]
    w = jnp.where(ur >= 0, 2, 1)
    return jnp.sum(jnp.where(ok, w, 0), axis=1).astype(jnp.int32)


def update_covisibility_for_kf(state: MapState, k: jnp.ndarray) -> MapState:
    """Recompute row/col k of the covisibility matrix: weight(k, j) = number
    of shared map points (reference KeyFrame::UpdateConnections,
    KeyFrame.cc:289-379).  The >=15-weight thresholding is applied by
    consumers, not stored."""
    M = state.mp_pos.shape[0]
    obs_k = state.kf_obs[k]                      # [N]
    mark = jnp.zeros((M + 1,), jnp.bool_).at[
        jnp.where(obs_k >= 0, obs_k, M)].set(True)
    mark = mark.at[M].set(False)
    # for every other KF count observations of marked points
    shared = jnp.sum(
        mark[jnp.where(state.kf_obs >= 0, state.kf_obs, M)], axis=1
    ).astype(jnp.int32)                          # [K]
    shared = jnp.where(state.kf_valid, shared, 0)
    shared = shared.at[k].set(0)
    covis = state.covis.at[k, :].set(shared).at[:, k].set(shared)
    return state._replace(covis=covis)


def spanning_parent_for_kf(state: MapState, k: jnp.ndarray) -> jnp.ndarray:
    """First-connection spanning-tree parent: the top covisible earlier KF
    (reference KeyFrame.cc:371-376)."""
    w = state.covis[k]
    earlier = (jnp.arange(w.shape[0]) < k) & state.kf_valid
    w = jnp.where(earlier, w, -1)
    parent = jnp.argmax(w)
    return jnp.where(jnp.max(w) > 0, parent, -1).astype(jnp.int32)


def covisible_neighbors(state: MapState, k: jnp.ndarray, n: int,
                        min_weight: int = 1) -> jnp.ndarray:
    """Top-n covisible KF ids of k by weight (-1 padded), the reference's
    GetBestCovisibilityKeyFrames (KeyFrame.cc:123-157)."""
    w = jnp.where(state.kf_valid, state.covis[k], 0)
    top_w, idx = jax.lax.top_k(w, n)
    return jnp.where(top_w >= min_weight, idx, -1).astype(jnp.int32)


def resolve_replaced(state: MapState, pid: jnp.ndarray) -> jnp.ndarray:
    """Follow the replacement forwarding chain one hop (chains are collapsed
    at replace time so one hop suffices)."""
    fwd = state.mp_replaced[jnp.clip(pid, 0, None)]
    return jnp.where((pid >= 0) & (fwd >= 0), fwd, pid)

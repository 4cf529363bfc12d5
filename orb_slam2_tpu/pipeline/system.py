"""SLAM session facade: the TPU equivalent of reference `System`
(System.cc) + the host-side scheduler that replaces its four threads.

Per frame the host runs a handful of jitted phase functions and branches on
a few scalars (tracking status, match counts) — the deterministic schedule
that replaces the reference's mutex/queue protocol (SURVEY.md §2.5).
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import MONOCULAR, RGBD, STEREO, SLAMConfig
from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.map import empty_map, ops
from orb_slam2_tpu.map.state import point_obs_count
from orb_slam2_tpu.pipeline import frame as frame_mod
from orb_slam2_tpu.pipeline import init as init_mod
from orb_slam2_tpu.pipeline import mapping, tracking
from orb_slam2_tpu.pipeline.tracking import (LOST, NOT_INITIALIZED, OK,
                                             TrackState)


class SLAM:
    """One SLAM session.  Usage:

        slam = SLAM(cfg)
        for img, t in sequence:
            Tcw = slam.track_mono(img, t)
        slam.save_trajectory_tum("traj.txt")
    """

    def __init__(self, cfg: SLAMConfig):
        self.cfg = cfg
        self.state = empty_map(cfg)
        self.ts = tracking.empty_track_state(cfg)
        self.frame_count = 0
        self.traj: List[dict] = []   # per-frame {fid, t, Tcw, ref_kf, Tcr}
        self.timings: List[float] = []
        self._key = jax.random.PRNGKey(0)

        if cfg.sensor == MONOCULAR:
            self._frame_fn = jax.jit(frame_mod.build_mono_frame_fn(cfg))
        elif cfg.sensor == RGBD:
            self._frame_fn = jax.jit(frame_mod.build_rgbd_frame_fn(cfg))
        else:
            self._frame_fn = jax.jit(frame_mod.build_stereo_frame_fn(cfg))

        self._store_init = jax.jit(init_mod.store_init_frame)
        self._match_init = jax.jit(
            lambda ts, f: init_mod.match_for_init(ts, f, cfg))
        self._create_mono_map = jax.jit(
            lambda st, ts, f, m, k: init_mod.create_mono_map(st, ts, f, m, k, cfg))
        self._stereo_init = jax.jit(
            lambda st, ts, f: init_mod.stereo_initialize(st, ts, f, cfg))
        self._track_motion = jax.jit(
            lambda st, ts, f: tracking.track_with_motion_model(st, ts, f, cfg))
        self._track_ref = jax.jit(
            lambda st, ts, f: tracking.track_reference_keyframe(st, ts, f, cfg))
        self._track_local = jax.jit(
            lambda st, ts, f, T, p, ar: tracking.track_local_map(
                st, ts, f, T, p, cfg, ar))
        self._insert_kf = jax.jit(ops.insert_keyframe)
        self._triangulate = jax.jit(
            lambda st, k: mapping.triangulate_new_points(st, k, cfg))
        self._depth_points = jax.jit(
            lambda st, k: mapping.create_depth_points(st, k, cfg))
        self._cull = jax.jit(lambda st, k: mapping.cull_points(st, k, cfg))
        self._ref_matches = jax.jit(self._n_ref_matches)

    # ------------------------------------------------------------------
    def _n_ref_matches(self, state, ref_kf, min_obs):
        """Tracked points in the reference KF with >= nMinObs observations
        (reference Tracking.cc:986-990: nMinObs = 3, or 2 while the map has
        <= 2 keyframes)."""
        cnt = point_obs_count(state)
        obs = state.kf_obs[ref_kf]
        ok = (obs >= 0) & (cnt[jnp.clip(obs, 0, None)] >= min_obs)
        return jnp.sum(ok.astype(jnp.int32))

    # ------------------------------------------------------------------
    def track_mono(self, img: np.ndarray, timestamp: float) -> Optional[np.ndarray]:
        frame = self._frame_fn(jnp.asarray(img, jnp.float32),
                               self.frame_count, timestamp)
        return self._track(frame)

    def track_rgbd(self, img, depth, timestamp: float):
        frame = self._frame_fn(jnp.asarray(img, jnp.float32),
                               jnp.asarray(depth, jnp.float32),
                               self.frame_count, timestamp)
        return self._track(frame)

    def track_stereo(self, img_l, img_r, timestamp: float):
        frame = self._frame_fn(jnp.asarray(img_l, jnp.float32),
                               jnp.asarray(img_r, jnp.float32),
                               self.frame_count, timestamp)
        return self._track(frame)

    # ------------------------------------------------------------------
    def _track(self, frame) -> Optional[np.ndarray]:
        t0 = time.perf_counter()
        status = int(self.ts.status)
        if status == NOT_INITIALIZED:
            self._initialize(frame)
        else:
            self._track_frame(frame)
        self.frame_count += 1
        self.timings.append(time.perf_counter() - t0)
        if int(self.ts.status) == OK:
            Tcw = np.asarray(self.ts.T)
            ref = int(self.ts.ref_kf)
            Tcr = lie.se3_compose(self.ts.T,
                                  lie.se3_inverse(self.state.kf_pose[ref]))
            self.traj.append(dict(fid=self.frame_count - 1,
                                  t=float(frame.timestamp), Tcw=Tcw,
                                  ref_kf=ref, Tcr=np.asarray(Tcr), lost=False))
            return Tcw
        self.traj.append(dict(fid=self.frame_count - 1,
                              t=float(frame.timestamp), Tcw=None,
                              ref_kf=int(self.ts.ref_kf), Tcr=None, lost=True))
        return None

    # ------------------------------------------------------------------
    def _initialize(self, frame):
        cfg = self.cfg
        if cfg.sensor != MONOCULAR:
            if int(frame.n) >= cfg.tracking.stereo_init_min_kps:
                self.state, self.ts, ok = self._stereo_init(
                    self.state, self.ts, frame)
            return
        if not bool(self.ts.init_valid_frame):
            self.ts = self._store_init(self.ts, frame)
            return
        if int(frame.n) <= cfg.tracking.min_init_kps:
            self.ts = self.ts._replace(init_valid_frame=jnp.asarray(False))
            return
        match = self._match_init(self.ts, frame)
        if int(match.n) < cfg.tracking.min_init_matches:
            self.ts = self._store_init(self.ts, frame)
            return
        self._key, sub = jax.random.split(self._key)
        state, ts, ok = self._create_mono_map(self.state, self.ts, frame,
                                              match.idx, sub)
        if bool(ok):
            self.state, self.ts = state, ts
            # refine the fresh two-KF map
            k1 = int(self.state.next_kf) - 1
            self.state = self._triangulate(self.state, jnp.asarray(k1))
        else:
            self.ts = self._store_init(self.ts, frame)

    # ------------------------------------------------------------------
    def _track_frame(self, frame):
        cfg = self.cfg
        ok = False
        cur_pids = None
        opt = None
        if bool(self.ts.has_velocity):
            cur_pids, opt, ok_t = self._track_motion(self.state, self.ts, frame)
            ok = bool(ok_t)
        if not ok:
            cur_pids, opt, ok_t = self._track_ref(self.state, self.ts, frame)
            ok = bool(ok_t)
        if ok:
            after_reloc = jnp.asarray(
                self.frame_count - int(self.ts.last_reloc_frame_id)
                < cfg.tracking.reloc_recent_window)
            self.state, cur_pids, opt, ok_t = self._track_local(
                self.state, self.ts, frame, opt.T, cur_pids, after_reloc)
            ok = bool(ok_t)

        if not ok:
            self.ts = self.ts._replace(status=jnp.asarray(LOST, jnp.int32))
            if int(self.state.n_kf) <= 5:
                self.reset()
            return

        T = opt.T
        velocity = lie.se3_compose(T, lie.se3_inverse(self.ts.last_T))
        self.ts = self.ts._replace(
            status=jnp.asarray(OK, jnp.int32), T=T,
            velocity=velocity, has_velocity=jnp.asarray(True),
            last_T=T, last_pids=cur_pids, last_uv=frame.uv,
            last_octave=frame.octave, last_angle=frame.angle,
            last_valid=frame.valid)

        if self._need_new_keyframe(frame, opt):
            self._create_keyframe(frame, cur_pids)

    # ------------------------------------------------------------------
    def _need_new_keyframe(self, frame, opt) -> bool:
        """Deterministic keyframe policy (reference Tracking::NeedNewKeyFrame
        Tracking.cc:977-1061, minus the queue-idle heuristics)."""
        cfg = self.cfg
        if int(self.state.next_kf) >= cfg.cap.max_keyframes - 2:
            return False
        n_kf = int(self.state.n_kf)
        frames_since = self.frame_count - int(self.ts.last_kf_frame_id)
        n_inliers = int(opt.n_inliers)
        min_obs = 2 if n_kf <= 2 else cfg.tracking.kf_min_obs
        n_ref = int(self._ref_matches(self.state, self.ts.ref_kf,
                                      jnp.asarray(min_obs)))
        th_ratio = (cfg.tracking.kf_ref_ratio_mono if cfg.sensor == MONOCULAR
                    else cfg.tracking.kf_ref_ratio_stereo)
        if n_kf <= 2:
            th_ratio = 0.4 if cfg.sensor != MONOCULAR else th_ratio
        c1a = frames_since >= cfg.tracking.max_frames_hint
        c1b = frames_since >= cfg.tracking.min_frames
        c2 = (n_inliers < n_ref * th_ratio) and n_inliers > 15
        return (c1a or c1b) and c2

    def _create_keyframe(self, frame, cur_pids):
        self.state, kf_id = self._insert_kf(self.state, frame, self.ts.T,
                                            cur_pids)
        if self.cfg.sensor != MONOCULAR:
            self.state = self._depth_points(self.state, kf_id)
        self.state = self._triangulate(self.state, kf_id)
        self.state = self._cull(self.state, kf_id)
        self.ts = self.ts._replace(
            ref_kf=kf_id,
            last_kf_frame_id=jnp.asarray(self.frame_count, jnp.int32))

    # ------------------------------------------------------------------
    def reset(self):
        """Reference System/Tracking::Reset (Tracking.cc:1504-1550)."""
        self.state = empty_map(self.cfg)
        self.ts = tracking.empty_track_state(self.cfg)
        self.traj.clear()

    # ------------------------------------------------------------------
    def save_trajectory_tum(self, path: str):
        """TUM format: `t tx ty tz qx qy qz qw` of Twc per tracked frame,
        built as Tcr x (optimized) reference-KF pose (reference
        System::SaveTrajectoryTUM, System.cc:322-380)."""
        kf_pose = np.asarray(self.state.kf_pose)
        with open(path, "w") as f:
            for rec in self.traj:
                if rec["lost"]:
                    continue
                Tcw = np.asarray(lie.se3_compose(
                    jnp.asarray(rec["Tcr"]), jnp.asarray(kf_pose[rec["ref_kf"]])))
                Twc = np.asarray(lie.se3_inverse(jnp.asarray(Tcw)))
                qw, qx, qy, qz, tx, ty, tz = Twc
                f.write(f"{rec['t']:.6f} {tx:.7f} {ty:.7f} {tz:.7f} "
                        f"{qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}\n")

    def poses_twc(self) -> np.ndarray:
        """[F, 7] Twc for all tracked frames (for evaluation)."""
        kf_pose = np.asarray(self.state.kf_pose)
        out = []
        for rec in self.traj:
            if rec["lost"]:
                continue
            Tcw = lie.se3_compose(jnp.asarray(rec["Tcr"]),
                                  jnp.asarray(kf_pose[rec["ref_kf"]]))
            out.append(np.asarray(lie.se3_inverse(Tcw)))
        return np.stack(out) if out else np.zeros((0, 7))

    def timestamps(self):
        return np.asarray([r["t"] for r in self.traj if not r["lost"]])

"""SLAM session facade: the TPU equivalent of reference `System`
(System.cc) + the host-side scheduler that replaces its four threads.

Host<->device traffic is the scarce resource through the TPU tunnel: a
*synchronous* device->host read costs tens of ms, while async transfers
pipeline freely.  The per-frame path is therefore ONE fused jit
(`_full_step`: extraction -> tracking -> keyframe decision -> conditional
keyframe integration, all on device via `lax.cond`) with **zero synchronous
host reads**.  A small int32 "HUD" vector is copied host-ward asynchronously
every frame and inspected `hud_lag` frames later to drive the rare host-side
reactions (relocalization, loop closing, reset) — the same lag the
reference's LocalMapping/LoopClosing threads exhibit relative to tracking.
The trajectory log lives on device inside TrackState and is downloaded once
at export time.
"""

from __future__ import annotations

import time
from collections import deque
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import MONOCULAR, RGBD, STEREO, SLAMConfig
from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.map import empty_map, ops
from orb_slam2_tpu.pipeline import frame as frame_mod
from orb_slam2_tpu.pipeline import init as init_mod
from orb_slam2_tpu.pipeline import mapping, tracking
from orb_slam2_tpu.pipeline.tracking import (HUD_N_KF, HUD_NEED_KF,
                                             HUD_REF_KF, HUD_STATUS, LOST,
                                             NOT_INITIALIZED, OK, TrackState,
                                             record_traj)


class SLAM:
    """One SLAM session.  Usage:

        slam = SLAM(cfg)
        for img, t in sequence:
            slam.track_mono(img, t)
        slam.save_trajectory_tum("traj.txt")
    """

    def __init__(self, cfg: SLAMConfig, vocab_path: Optional[str] = None,
                 enable_loop_closing: bool = True):
        self.cfg = cfg
        self.state = empty_map(cfg)
        self.ts = tracking.empty_track_state(cfg)
        self.frame_count = 0
        self.status = NOT_INITIALIZED  # host mirror, hud_lag frames behind
        self.last_hud = np.zeros(8, np.int32)
        self.timings: List[float] = []
        self._key = jax.random.PRNGKey(0)
        self.enable_loop = enable_loop_closing
        self.last_loop_kf = -100
        self.localization_only = False
        # async-HUD pipeline: entries (frame_id, hud_devarray, Frame)
        self.hud_lag = 8
        self._pending: deque = deque()
        self._loop_pending: deque = deque()   # (frame_id, kf_id, ids, groups)
        self._reloc_pending = None            # (frame_id, (ok,T,pids,cand), Frame)

        # vocabulary (reference loads ORBvoc.txt at startup, System.cc:62;
        # we ship a trained default, see place/vocab.py)
        import os
        from orb_slam2_tpu.place.vocab import Vocabulary, build_transform
        default_vocab = os.path.join(os.path.dirname(__file__), "..",
                                     "data", "vocab_default.npz")
        path = vocab_path or default_vocab
        self.vocab = Vocabulary.load(path) if os.path.exists(path) else None
        bow_cap = cfg.vocab.branching ** cfg.vocab.depth
        self._transform = (build_transform(self.vocab, pad_to=bow_cap)
                           if self.vocab is not None else None)

        if cfg.sensor == MONOCULAR:
            raw_frame_fn = frame_mod.build_mono_frame_fn(cfg)
        elif cfg.sensor == RGBD:
            raw_frame_fn = frame_mod.build_rgbd_frame_fn(cfg)
        else:
            raw_frame_fn = frame_mod.build_stereo_frame_fn(cfg)
        self._frame_fn = jax.jit(raw_frame_fn)

        raw_track_step = tracking.build_track_step(cfg)
        self._track_step = jax.jit(raw_track_step)
        self._store_init = jax.jit(init_mod.store_init_frame)
        self._match_init = jax.jit(
            lambda ts, f: init_mod.match_for_init(ts, f, cfg))
        self._create_mono_map = jax.jit(
            lambda st, ts, f, m, k: init_mod.create_mono_map(st, ts, f, m, k, cfg))
        self._stereo_init = jax.jit(
            lambda st, ts, f: init_mod.stereo_initialize(st, ts, f, cfg))

        from orb_slam2_tpu.ba import local as ba_local

        # --- staged keyframe integration: the deterministic equivalent of
        # the reference's concurrent LocalMapping thread (LocalMapping.cc:
        # 47-112).  Insertion is cheap and inline; triangulation, fusion,
        # the 15-iteration local BA (5+10 schedule, Optimizer.cc:659-709)
        # and culling advance ONE stage per subsequent tracked frame, so no
        # single frame carries the whole ~350 ms integration.  The BA runs
        # as 3 chunks of 5 exact LM iterations with the damping carried in
        # ts.ba_lam (identical trajectory to one 15-iteration run, modulo
        # the map growing between chunks — exactly the reference's
        # interruptible-BA concurrency). ---
        BA_ITERS = 5
        total_ba = cfg.ba.local_ba_iters1 + cfg.ba.local_ba_iters2
        BA_CHUNKS = max(-(-total_ba // BA_ITERS), 1)
        N_STAGES = 2 + BA_CHUNKS + 1   # tri, fuse, BA chunks, culls

        def insert_kf(state, ts, frame, cur_pids):
            state, kf_id = ops.insert_keyframe(state, frame, ts.T, cur_pids)
            if cfg.sensor != MONOCULAR:
                state = mapping.create_depth_points(state, kf_id, cfg)
            ts = ts._replace(ref_kf=kf_id,
                             last_kf_frame_id=frame.frame_id,
                             map_kf=kf_id, map_stage=jnp.asarray(0, jnp.int32),
                             ba_lam=jnp.asarray(1e-4, jnp.float32))
            ts = record_traj(state, ts, frame, jnp.asarray(True))
            return state, ts

        def mapping_stage(state, ts):
            """Advance the pending keyframe's integration by one stage."""
            k = jnp.clip(ts.map_kf, 0, None)

            def s_tri(op):
                st, t = op
                return mapping.triangulate_new_points(st, k, cfg), t

            def s_fuse(op):
                st, t = op
                return mapping.fuse_neighbors(st, k, cfg), t

            def s_ba(op):
                st, t = op
                st, lam = ba_local.local_ba(st, k, cfg, n_outer=BA_ITERS,
                                            lam0=t.ba_lam, return_lam=True)
                return st, t._replace(ba_lam=lam)

            def s_cull(op):
                st, t = op
                st = mapping.cull_points(st, k, cfg)
                st, t = mapping.cull_redundant_keyframes(st, t, k, cfg)
                return st, t

            branches = [s_tri, s_fuse] + [s_ba] * BA_CHUNKS + [s_cull]
            state, ts = jax.lax.switch(
                jnp.clip(ts.map_stage, 0, N_STAGES - 1), branches,
                (state, ts))
            stage = ts.map_stage + 1
            done = stage >= N_STAGES
            ts = ts._replace(
                map_stage=jnp.where(done, 0, stage),
                map_kf=jnp.where(done, -1, ts.map_kf))
            return state, ts

        def keyframe_step(state, ts, frame, cur_pids):
            """Synchronous insert + full integration (bench stage probe and
            host-side callers; the per-frame path uses the staged version)."""
            state, ts = insert_kf(state, ts, frame, cur_pids)
            for _ in range(N_STAGES):
                state, ts = mapping_stage(state, ts)
            return state, ts

        self._keyframe_step = jax.jit(keyframe_step)
        self._mapping_stage = jax.jit(mapping_stage)
        self._global_ba = jax.jit(
            lambda st: ba_local.global_ba(st, cfg,
                                          n_outer=cfg.ba.global_ba_iters,
                                          n_cg=40))
        self._record = jax.jit(record_traj)
        # post-loop global BA runs chunked between frames (reference runs it
        # on a transient thread, LoopClosing.cc:576-579) — see ba/async_gba.py
        from orb_slam2_tpu.ba.async_gba import AsyncGBA
        self._gba = AsyncGBA(cfg)

        # place recognition / loop closing / relocalization
        if self._transform is not None:
            from orb_slam2_tpu.pipeline import loopclosing, reloc

            def set_bow(state, kf_id, desc, valid):
                bow, _, _ = self._transform(desc, valid)
                return state._replace(kf_bow=state.kf_bow.at[kf_id].set(bow))

            self._set_bow = jax.jit(set_bow)
            self._loop_detect = jax.jit(
                lambda st, k: loopclosing.detect(st, k, cfg))
            self._loop_verify = jax.jit(
                lambda st, k, c, key: loopclosing.verify(st, k, c, key, cfg))
            self._loop_correct = jax.jit(
                lambda st, k, c, S, lp: loopclosing.correct(st, k, c, S, lp, cfg))
            self._reloc_step = jax.jit(reloc.build_reloc_step(cfg, self._transform))
            self._consistency = loopclosing.ConsistencyTracker(
                cfg.loop.covisibility_consistency_th)

        # --- the fused per-frame step: extraction + tracking + conditional
        # keyframe integration + BoW, one jit, zero host reads ---
        transform = self._transform

        def full_step(state, ts, imgs, frame_id, timestamp, loc_only):
            frame = raw_frame_fn(*imgs, frame_id, timestamp)
            state, ts, cur_pids, hud = raw_track_step(state, ts, frame,
                                                      loc_only)
            # keyframe policy vs the mapping pipeline (reference
            # AcceptKeyFrames/InterruptBA, Tracking.cc:999,1047): while the
            # previous KF's triangulation/fusion stages are pending, defer;
            # once only BA/cull stages remain, a new insertion aborts them
            # (LocalMapping::InsertKeyFrame sets mbAbortBA,
            # LocalMapping.cc:114-119).
            busy_early = (ts.map_kf >= 0) & (ts.map_stage <= 1)
            need = (hud[HUD_NEED_KF] > 0) & jnp.logical_not(loc_only) & \
                jnp.logical_not(busy_early)

            def do_kf(op):
                st, t = op
                st, t = insert_kf(st, t, frame, cur_pids)
                if transform is not None:
                    bow, _, _ = transform(frame.desc, frame.valid)
                    st = st._replace(kf_bow=st.kf_bow.at[t.ref_kf].set(bow))
                return st, t

            state, ts = jax.lax.cond(need, do_kf, lambda op: op, (state, ts))
            state, ts = jax.lax.cond(
                ts.map_kf >= 0, lambda op: mapping_stage(*op),
                lambda op: op, (state, ts))
            hud = jnp.concatenate([
                hud.at[HUD_NEED_KF].set(need.astype(jnp.int32)),
                jnp.reshape(ts.ref_kf, (1,))])
            return state, ts, frame, hud

        self._full_step_raw = full_step    # for scan-batched super-steps
        self._full_step = jax.jit(full_step)

        # --- optional frame-batched super-step (cfg.frame_batch > 1): scan
        # B frames in ONE device program, amortizing per-program dispatch +
        # runtime overhead.  Padded slots (flush of a partial batch) pass
        # state through and emit hud[HUD_STATUS] = -1, ignored by _drain. ---
        self._batch: list = []
        if cfg.frame_batch > 1:
            n_img = 1 if cfg.sensor == MONOCULAR else 2

            def super_step(state, ts, stacked_imgs, fids, tss, actives,
                           loc_only):
                def body(carry, x):
                    st, t2 = carry
                    act = x[-1]
                    fid, t = x[n_img], x[n_img + 1]
                    im = tuple(x[:n_img])

                    def run(op):
                        return full_step(op[0], op[1], im, fid, t, loc_only)

                    def skip(op):
                        n = cfg.orb.max_keypoints
                        fr = frame_mod.Frame(
                            uv=jnp.zeros((n, 2)), uv_raw=jnp.zeros((n, 2)),
                            ur=jnp.full((n,), -1.0),
                            depth=jnp.full((n,), -1.0),
                            octave=jnp.zeros((n,), jnp.int32),
                            angle=jnp.zeros((n,)),
                            desc=jnp.zeros((n, 32), jnp.uint8),
                            valid=jnp.zeros((n,), bool),
                            frame_id=fid.astype(jnp.int32),
                            timestamp=t.astype(jnp.float32))
                        hud = jnp.full((tracking.HUD_LEN,), -1, jnp.int32)
                        return op[0], op[1], fr, hud

                    st, t2, fr, hud = jax.lax.cond(act, run, skip, (st, t2))
                    return (st, t2), (fr, hud)

                xs = tuple(stacked_imgs) + (fids, tss, actives)
                (state, ts), (frames, huds) = jax.lax.scan(
                    body, (state, ts), xs)
                return state, ts, frames, huds

            self._super_step = jax.jit(super_step)
        else:
            self._super_step = None

    # ------------------------------------------------------------------
    def track_mono(self, img: np.ndarray, timestamp: float):
        self._last_img = img
        return self._track((jnp.asarray(img, jnp.float32),), timestamp)

    def track_rgbd(self, img, depth, timestamp: float):
        self._last_img = img
        return self._track((jnp.asarray(img, jnp.float32),
                            jnp.asarray(depth, jnp.float32)), timestamp)

    def track_stereo(self, img_l, img_r, timestamp: float):
        self._last_img = img_l
        return self._track((jnp.asarray(img_l, jnp.float32),
                            jnp.asarray(img_r, jnp.float32)), timestamp)

    # ------------------------------------------------------------------
    def _track(self, imgs, timestamp):
        t0 = time.perf_counter()
        if self.status == NOT_INITIALIZED:
            frame = self._frame_fn(*imgs, self.frame_count, timestamp)
            self._initialize(frame)
            self.frame_count += 1
        elif self._super_step is not None:
            self._batch.append((imgs, self.frame_count, timestamp))
            self.frame_count += 1
            if len(self._batch) >= self.cfg.frame_batch:
                self._dispatch_batch()
            self._drain(self.hud_lag)
        else:
            state, ts, frame, hud = self._full_step(
                self.state, self.ts, imgs, self.frame_count, timestamp,
                jnp.asarray(self.localization_only))
            self.state, self.ts = state, ts
            hud.copy_to_host_async()
            self._pending.append((self.frame_count, hud, frame))
            self.frame_count += 1
            self._drain(self.hud_lag)
        self.timings.append(time.perf_counter() - t0)

    def _dispatch_batch(self):
        """Run the buffered frames through one scanned super-step (see
        cfg.frame_batch); partial batches (flush) are padded with inactive
        slots that pass state through."""
        entries = self._batch
        self._batch = []
        n = len(entries)
        if n == 0:
            return
        B = self.cfg.frame_batch
        while len(entries) < B:
            entries.append((entries[-1][0], -1, 0.0))   # inactive pad
        n_img = len(entries[0][0])
        stacked = tuple(jnp.stack([e[0][k] for e in entries])
                        for k in range(n_img))
        fids = jnp.asarray([e[1] for e in entries], jnp.int32)
        tss = jnp.asarray([e[2] for e in entries], jnp.float32)
        act = jnp.asarray([e[1] >= 0 for e in entries])
        state, ts, frames, huds = self._super_step(
            self.state, self.ts, stacked, fids, tss, act,
            jnp.asarray(self.localization_only))
        self.state, self.ts = state, ts
        huds.copy_to_host_async()
        for i in range(n):
            frame_i = jax.tree.map(lambda x: x[i], frames)
            self._pending.append((int(entries[i][1]), huds[i], frame_i))

    # ------------------------------------------------------------------
    def flush(self):
        """Process every pending async event and synchronize with the device.
        Call before reading trajectories/state counters."""
        if self._super_step is not None and self._batch:
            self._dispatch_batch()
        self._drain(0)
        # complete any staged keyframe integration (pending local-BA chunks)
        for _ in range(16):
            if int(self.ts.map_kf) < 0:
                break
            self.state, self.ts = self._mapping_stage(self.state, self.ts)
        self._step_gba(to_completion=True)
        jax.block_until_ready(self.ts.T)

    def _drain(self, keep: int):
        """Consume HUD entries older than `keep` frames and react: LOST ->
        reset/relocalize, inserted-KF -> loop-closing schedule.  With keep>0
        the reads are on transfers issued `keep` frames ago — effectively
        free (async d2h pipelines through the tunnel)."""
        while len(self._pending) > keep:
            fid, hud, frame = self._pending.popleft()
            hud = np.asarray(hud)
            self.last_hud = hud
            self.status = int(hud[HUD_STATUS])
            if self.status == OK:
                if hud[HUD_NEED_KF] and self.enable_loop and \
                        self._transform is not None:
                    self._schedule_loop_detect(int(hud[HUD_REF_KF]))
            else:
                if int(hud[HUD_N_KF]) <= 5:
                    # lost right after init: wipe and restart
                    # (reference Tracking.cc:472-480)
                    self.reset()
                    return
                if self._transform is not None and \
                        self._reloc_pending is None:
                    self._key, sub = jax.random.split(self._key)
                    out = self._reloc_step(self.state, frame, sub)
                    for o in out:
                        o.copy_to_host_async()
                    self._reloc_pending = (fid, out, frame)
        self._check_reloc(force=(keep == 0))
        self._check_loops(force=(keep == 0))
        self._step_gba()

    def _step_gba(self, to_completion: bool = False):
        """Advance the chunked post-loop global BA by one dispatch (a few LM
        iterations on the frozen snapshot problem); fold the result into the
        live map when the budget is done (LoopClosing.cc:645-749)."""
        if not self._gba.active:
            return
        while True:
            done = self._gba.step()
            if done:
                self.state, T_new = self._gba.merge(self.state, self.ts.T,
                                                    self.ts.ref_kf)
                self.ts = self.ts._replace(T=T_new, last_T=T_new,
                                           has_velocity=jnp.asarray(False))
                return
            if not to_completion:
                return

    # ------------------------------------------------------------------
    def _check_reloc(self, force: bool = False):
        """Apply a pending relocalization result once its transfer is ripe
        (reference Tracking::Relocalization, Tracking.cc:1341-1502)."""
        if self._reloc_pending is None:
            return
        fid, (ok, T, pids, cand), frame = self._reloc_pending
        if not force and self.frame_count - fid < self.hud_lag:
            return
        self._reloc_pending = None
        if not bool(np.asarray(ok)):
            return
        self.ts = self.ts._replace(
            status=jnp.asarray(OK, jnp.int32), T=T, last_T=T,
            has_velocity=jnp.asarray(False),
            last_pids=pids, last_uv=frame.uv, last_octave=frame.octave,
            last_angle=frame.angle, last_valid=frame.valid,
            last_desc=frame.desc, last_depth=frame.depth,
            ref_kf=cand.astype(jnp.int32),
            last_reloc_frame_id=frame.frame_id)
        self.ts = self._record(self.state, self.ts, frame, jnp.asarray(True))
        self.status = OK

    # ------------------------------------------------------------------
    def _initialize(self, frame):
        cfg = self.cfg
        if cfg.sensor != MONOCULAR:
            if int(frame.n) >= cfg.tracking.stereo_init_min_kps:
                self.state, self.ts, ok = self._stereo_init(
                    self.state, self.ts, frame)
                self.ts = self._record(self.state, self.ts, frame,
                                       jnp.asarray(True))
                if self._transform is not None:
                    self.state = self._set_bow(self.state, self.ts.ref_kf,
                                               frame.desc, frame.valid)
                self.status = OK
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
            init_desc = self.ts.init_desc
            init_valid = self.ts.init_kp_valid
            self.state, self.ts = state, ts
            # refine the fresh two-KF map: triangulate extra matches + GBA(20)
            # (reference Tracking.cc:686)
            k1 = int(self.state.next_kf) - 1
            self.state = self._global_ba(self.state)
            T1 = self.state.kf_pose[k1]
            self.ts = self.ts._replace(T=T1, last_T=T1)
            self.ts = self._record(self.state, self.ts, frame,
                                   jnp.asarray(True))
            if self._transform is not None:
                self.state = self._set_bow(self.state, jnp.asarray(k1 - 1),
                                           init_desc, init_valid)
                self.state = self._set_bow(self.state, jnp.asarray(k1),
                                           frame.desc, frame.valid)
            self.status = OK
        # on geometric failure (low parallax / ambiguous model) KEEP the
        # stored first frame and retry against the next frame with a larger
        # baseline — the reference keeps mpInitializer/mInitialFrame alive
        # when Initialize() fails (Tracking.cc:610 has no else-teardown);
        # the init frame is only replaced when matches drop below 100.

    # ------------------------------------------------------------------
    def _schedule_loop_detect(self, kf_id: int):
        """Dispatch loop-candidate detection for a fresh keyframe; results are
        fetched asynchronously by _check_loops (reference LoopClosing::Run,
        LoopClosing.cc:57-88 — a thread that naturally lags tracking)."""
        if kf_id - self.last_loop_kf < self.cfg.loop.min_kfs_since_last:
            return  # LoopClosing.cc:114
        ids, groups = self._loop_detect(self.state, jnp.asarray(kf_id))
        ids.copy_to_host_async()
        groups.copy_to_host_async()
        self._loop_pending.append((self.frame_count, kf_id, ids, groups))

    def _check_loops(self, force: bool = False):
        """Consume ripe loop-detection results: temporal consistency check,
        then Sim3 verification and loop correction (rare, synchronous)."""
        while self._loop_pending:
            fid, kf_id, ids, groups = self._loop_pending[0]
            if not force and self.frame_count - fid < self.hud_lag:
                return
            self._loop_pending.popleft()
            ids = np.asarray(ids)
            if (ids < 0).all():
                self._consistency.reset()
                continue
            consistent = self._consistency.update(ids, np.asarray(groups))
            for cand in consistent[:2]:
                self._key, sub = jax.random.split(self._key)
                ok, Scm, loop_pids, stats = self._loop_verify(
                    self.state, jnp.asarray(kf_id), jnp.asarray(cand), sub)
                if bool(ok):
                    self.state = self._loop_correct(
                        self.state, jnp.asarray(kf_id), jnp.asarray(cand),
                        Scm, loop_pids)
                    T_new = self.state.kf_pose[kf_id]
                    self.ts = self.ts._replace(T=T_new, last_T=T_new,
                                               has_velocity=jnp.asarray(False))
                    # GBA after the pose-graph: chunked between frames, like
                    # the reference's transient thread (LoopClosing.cc:576-579);
                    # a new loop closure discards a still-running solve
                    # (mbStopGBA abort, LoopClosing.cc:411-423)
                    self._gba.start(self.state, self.cfg.ba.loop_gba_iters)
                    self.last_loop_kf = kf_id
                    self._consistency.reset()
                    break

    # ------------------------------------------------------------------
    def _relocalize(self, frame):
        """Synchronous relocalization — used by diagnostics; the pipelined
        path goes through _drain/_check_reloc (reference
        Tracking::Relocalization, Tracking.cc:1341-1502)."""
        self._key, sub = jax.random.split(self._key)
        out = self._reloc_step(self.state, frame, sub)
        self._reloc_pending = (self.frame_count, out, frame)
        self._check_reloc(force=True)
        return self.status == OK

    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        """Reference System::ActivateLocalizationMode (System.cc:270): track
        against the frozen map, no keyframe insertion / mapping."""
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    # ------------------------------------------------------------------
    def reset(self):
        """Reference System/Tracking::Reset (Tracking.cc:1504-1550)."""
        self.state = empty_map(self.cfg)
        self.ts = tracking.empty_track_state(self.cfg)
        self.status = NOT_INITIALIZED
        self._gba.cancel()
        self._batch.clear()

    # ------------------------------------------------------------------
    def _traj_arrays(self):
        """Download the device trajectory once and rebuild frame poses as
        Tcr x (final optimized) reference-KF pose (reference
        System::SaveTrajectoryTUM, System.cc:322-380) — one batched jit."""
        self.flush()

        @jax.jit
        def rebuild(ts: TrackState, kf_pose):
            ref_f = ts.traj[:, 14]
            ref = jnp.clip(ref_f.astype(jnp.int32), 0, None)
            Tcw = jax.vmap(lie.se3_compose)(ts.traj[:, 7:14], kf_pose[ref])
            Twc = jax.vmap(lie.se3_inverse)(Tcw)
            return Tcw, Twc

        Tcw, Twc = rebuild(self.ts, self.state.kf_pose)
        Tcw, Twc = np.asarray(Tcw), np.asarray(Twc)
        traj = np.asarray(self.ts.traj)
        ok = (traj[:, 15] > 0.5) & (traj[:, 14] >= 0)
        ok[self.frame_count:] = False
        t = traj[:, 16]
        return [(t[i], Tcw[i], Twc[i]) for i in np.nonzero(ok)[0]]

    def poses_twc(self) -> np.ndarray:
        recs = self._traj_arrays()
        if not recs:
            return np.zeros((0, 7))
        return np.stack([r[2] for r in recs])

    def timestamps(self) -> np.ndarray:
        return np.asarray([r[0] for r in self._traj_arrays()])

    def save_trajectory_tum(self, path: str):
        with open(path, "w") as f:
            for t, _Tcw, Twc in self._traj_arrays():
                qw, qx, qy, qz, tx, ty, tz = Twc
                f.write(f"{t:.6f} {tx:.7f} {ty:.7f} {tz:.7f} "
                        f"{qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}\n")

    def save_keyframe_trajectory_tum(self, path: str):
        """Reference System::SaveKeyFrameTrajectoryTUM (System.cc:383-417):
        one TUM-format line per live keyframe, ordered by id."""
        self.flush()
        valid = np.asarray(self.state.kf_valid)
        tstamp = np.asarray(self.state.kf_timestamp)
        Twc = np.asarray(jax.vmap(lie.se3_inverse)(self.state.kf_pose))
        with open(path, "w") as f:
            for k in np.nonzero(valid)[0]:
                qw, qx, qy, qz, tx, ty, tz = Twc[k]
                f.write(f"{tstamp[k]:.6f} {tx:.7f} {ty:.7f} {tz:.7f} "
                        f"{qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}\n")

    # ------------------------------------------------------------------
    # map checkpoint / resume (SURVEY.md §5; reference System.h:115-117 TODO)
    def save_map(self, path: str):
        """Checkpoint the full map to a compressed npz."""
        from orb_slam2_tpu.map.checkpoint import save_map
        self.flush()
        save_map(self.state, path)

    def load_map(self, path: str):
        """Load a prebuilt map and arm relocalization: the next frames track
        against it (pair with activate_localization_mode() for pure
        localization, reference README.md:232-239)."""
        from orb_slam2_tpu.map.checkpoint import load_map
        self.state = load_map(path)
        self.ts = tracking.empty_track_state(self.cfg)
        self.ts = self.ts._replace(status=jnp.asarray(LOST, jnp.int32),
                                   ref_kf=jnp.asarray(0, jnp.int32))
        self.status = LOST
        self._pending.clear()
        self._loop_pending.clear()
        self._reloc_pending = None
        self._gba.cancel()

    # ------------------------------------------------------------------
    # observability (reference System.cc:474-490)
    def get_tracking_state(self) -> int:
        """Reference System::GetTrackingState."""
        return self.status

    def get_tracked_map_points(self) -> np.ndarray:
        """Per-keypoint map-point id of the last tracked frame (-1 = none);
        the array equivalent of System::GetTrackedMapPoints."""
        self.flush()
        return np.asarray(self.ts.last_pids)

    def get_tracked_keypoints_un(self) -> np.ndarray:
        """Undistorted keypoints [N, 2] of the last tracked frame with their
        validity mask [N] (System::GetTrackedKeyPointsUn)."""
        self.flush()
        return np.asarray(self.ts.last_uv), np.asarray(self.ts.last_valid)

    def map_changed(self) -> bool:
        """Reference System::MapChanged (System.cc:282-293): big-change
        counter advanced by loop correction / global BA."""
        idx = int(self.state.big_change)
        changed = idx != getattr(self, "_last_big_change", 0)
        self._last_big_change = idx
        return changed

    def draw_current_frame(self, out_path: str) -> str:
        """Render the last tracked frame with its keypoint overlay and status
        bar (reference FrameDrawer::DrawFrame, FrameDrawer.cc:38-165)."""
        from orb_slam2_tpu.viz.viewer import render_frame
        self.flush()
        img = getattr(self, "_last_img", None)
        if img is None:
            img = np.zeros((self.cfg.camera.height, self.cfg.camera.width))
        return render_frame(
            img, np.asarray(self.ts.last_uv), np.asarray(self.ts.last_valid),
            np.asarray(self.ts.last_pids), self.status,
            int(self.state.n_kf), int(self.state.n_mp), out_path,
            loc_only=self.localization_only)

    def save_trajectory_kitti(self, path: str):
        """KITTI format: per-frame 3x4 row-major Twc matrix
        (reference System::SaveTrajectoryKITTI, System.cc:419-472)."""

        def rot(q):
            w, x, y, z = q
            return np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])

        with open(path, "w") as f:
            for _t, _Tcw, Twc in self._traj_arrays():
                m = np.concatenate([rot(Twc[:4]), Twc[4:7, None]], axis=1)
                f.write(" ".join(f"{v:.6e}" for v in m.reshape(-1)) + "\n")

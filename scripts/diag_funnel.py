"""Per-frame tracking funnel: where do matches get lost?

For each frame after init prints:
  mm   = motion-model/ref-KF matches before pose opt
  in1  = inliers after first pose opt
  vis  = frustum-visible map points
  srch = searchable (visible & unmatched) candidates
  add  = local-map matches added by projection search
  in2  = final inliers after second pose opt
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu import config
from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.io import synthetic
from orb_slam2_tpu.map.state import resolve_replaced
from orb_slam2_tpu.pipeline import tracking
from orb_slam2_tpu.pipeline.system import SLAM
from orb_slam2_tpu.pipeline.tracking import (HUD_N_KF, HUD_NEED_KF,
                                             HUD_STATUS, NOT_INITIALIZED, OK)

cfg = config.SLAMConfig()


def build_probe():
    K = camera.intrinsics(cfg.camera)

    def probe(state, ts, frame):
        def do_motion(_):
            pids, opt, ok = tracking.track_with_motion_model(
                state, ts, frame, cfg)
            return pids, opt.T, opt.n_inliers, ok

        def do_ref(_):
            pids, opt, ok = tracking.track_reference_keyframe(
                state, ts, frame, cfg)
            return pids, opt.T, opt.n_inliers, ok

        pids_m, T_m, ninl_m, ok_m = jax.lax.cond(
            ts.has_velocity, do_motion, do_ref, None)
        pids, T, ninl, ok1 = jax.lax.cond(
            ok_m, lambda _: (pids_m, T_m, ninl_m, ok_m), do_ref, None)
        n_mm = jnp.sum((pids >= 0).astype(jnp.int32))

        # --- local-map funnel (mirror of track_local_map) ---
        pc = lie.se3_apply(T, state.mp_pos)
        uv_pred = camera.project(K, pc)
        bounds = jnp.asarray([0.0, cfg.camera.width, 0.0, cfg.camera.height])
        cam_c = lie.quat_rotate(lie.quat_conj(lie.se3_q(T)), lie.se3_t(T))
        dist = jnp.linalg.norm(state.mp_pos + cam_c, axis=-1)
        view_cos = jnp.sum((state.mp_pos + cam_c) * state.mp_normal, -1) / \
            jnp.maximum(dist, 1e-9)
        in_band = (dist >= 0.8 * state.mp_min_dist) & \
                  (dist <= 1.2 * state.mp_max_dist)
        in_frust = state.mp_valid & (pc[:, 2] > 0) & \
            camera.in_image(uv_pred, bounds)
        visible = in_frust & in_band & (view_cos > 0.5)

        after_reloc = jnp.asarray(False)
        (vis_d, found_d), pids2, opt2, ok2 = tracking.track_local_map(
            state, ts, frame, T, pids, cfg, after_reloc)
        n_add = jnp.sum((pids2 >= 0).astype(jnp.int32)) - \
            jnp.sum((jnp.where(opt2.inliers, pids, -1) >= 0).astype(jnp.int32))
        return jnp.stack([
            n_mm, ninl,
            jnp.sum(in_frust.astype(jnp.int32)),
            jnp.sum((in_frust & in_band).astype(jnp.int32)),
            jnp.sum((in_frust & in_band & (view_cos > 0.5)).astype(jnp.int32)),
            jnp.sum(visible.astype(jnp.int32)),
            opt2.n_inliers])

    return jax.jit(probe)


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "35"))
    seq = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=500,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)
    probe = build_probe()

    for f in range(n_frames):
        img = jnp.asarray(seq.images[f], jnp.float32)
        frame = slam._frame_fn(img, slam.frame_count, seq.timestamps[f])
        if slam.status == NOT_INITIALIZED:
            slam._initialize(frame)
            slam.frame_count += 1
            print(f"{f:3d} init status={slam.status}")
            continue
        p = np.asarray(probe(slam.state, slam.ts, frame))
        state, ts, cur_pids, hud = slam._track_step(slam.state, slam.ts, frame)
        hud = np.asarray(hud)
        slam.state, slam.ts = state, ts
        slam.status = int(hud[HUD_STATUS])
        kf = ""
        if slam.status == OK and hud[HUD_NEED_KF]:
            slam.state, slam.ts = slam._keyframe_step(slam.state, slam.ts,
                                                      frame, cur_pids)
            if slam._transform is not None:
                slam.state = slam._set_bow(slam.state, slam.ts.ref_kf,
                                           frame.desc, frame.valid)
            kf = " KF"
        elif slam.status != OK:
            kf = " LOST"
        slam.frame_count += 1
        print(f"{f:3d} mm={p[0]:4d} in1={p[1]:4d} frust={p[2]:4d} "
              f"band={p[3]:4d} vcos={p[4]:4d} vis={p[5]:4d} in2={p[6]:4d}"
              f"{kf}")


if __name__ == "__main__":
    main()

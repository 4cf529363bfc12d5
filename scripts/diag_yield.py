"""Diagnose map-point yield and tracking gates on the synthetic sequence.

Per frame prints: status, inliers; per keyframe step: how many points each
stage produced/culled, and the local-map visibility/search funnel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu import config
from orb_slam2_tpu.io import evaluate, synthetic
from orb_slam2_tpu.pipeline.system import SLAM
from orb_slam2_tpu.pipeline.tracking import (HUD_N_INLIERS, HUD_N_KF,
                                             HUD_N_MP, HUD_NEED_KF,
                                             HUD_STATUS, NOT_INITIALIZED, OK)


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    cfg = config.SLAMConfig()
    seq = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=500,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)

    from orb_slam2_tpu.map import ops
    from orb_slam2_tpu.pipeline import mapping
    from orb_slam2_tpu.ba import local as ba_local
    from orb_slam2_tpu.pipeline.tracking import record_traj

    # keyframe step broken into stages, each reporting n_mp afterwards
    def staged_kf(state, ts, frame, cur_pids):
        counts = []
        state, kf_id = ops.insert_keyframe(state, frame, ts.T, cur_pids)
        counts.append(state.n_mp)
        state = mapping.triangulate_new_points(state, kf_id, cfg)
        counts.append(state.n_mp)
        state = mapping.fuse_neighbors(state, kf_id, cfg)
        counts.append(state.n_mp)
        state = ba_local.local_ba(
            state, kf_id, cfg,
            n_outer=cfg.ba.local_ba_iters1 + cfg.ba.local_ba_iters2, n_cg=25)
        state = mapping.cull_points(state, kf_id, cfg)
        counts.append(state.n_mp)
        T_new = state.kf_pose[kf_id]
        ts = ts._replace(T=T_new, last_T=T_new, ref_kf=kf_id,
                         last_kf_frame_id=frame.frame_id)
        ts = record_traj(state, ts, frame, jnp.asarray(True))
        return state, ts, jnp.stack(counts)

    staged_kf = jax.jit(staged_kf)

    for f in range(n_frames):
        img = jnp.asarray(seq.images[f], jnp.float32)
        frame = slam._frame_fn(img, slam.frame_count, seq.timestamps[f])
        if slam.status == NOT_INITIALIZED:
            slam._initialize(frame)
            slam.frame_count += 1
            print(f"{f:3d} init status={slam.status} "
                  f"n_mp={int(slam.state.n_mp)}")
            continue
        state, ts, cur_pids, hud = slam._track_step(slam.state, slam.ts, frame)
        hud = np.asarray(hud)
        slam.state, slam.ts = state, ts
        slam.status = int(hud[HUD_STATUS])
        line = (f"{f:3d} st={hud[HUD_STATUS]} inl={hud[HUD_N_INLIERS]:4d} "
                f"kf={hud[HUD_N_KF]:3d} mp={hud[HUD_N_MP]:5d}")
        if slam.status == OK and hud[HUD_NEED_KF]:
            slam.state, slam.ts, counts = staged_kf(slam.state, slam.ts,
                                                    frame, cur_pids)
            c = np.asarray(counts)
            line += (f"  KF: insert->{c[0]} tri->{c[1]} fuse->{c[2]} "
                     f"ba+cull->{c[3]}")
            if slam._transform is not None:
                slam.state = slam._set_bow(slam.state, slam.ts.ref_kf,
                                           frame.desc, frame.valid)
        elif slam.status != OK:
            if int(hud[HUD_N_KF]) <= 5:
                slam.reset()
                line += "  RESET"
            elif slam._transform is not None:
                ok = slam._relocalize(frame)
                line += f"  reloc={'ok' if ok else 'fail'}"
        slam.frame_count += 1
        print(line)


if __name__ == "__main__":
    main()

"""Per-stage timing + tracking-status diagnostic on the synthetic bench
sequence.  Run on the real TPU: `python scripts/profile_track.py`.

Prints per-frame: stage timings (frame_fn / track_step / keyframe_step /
bow / loop detect) and HUD (status, inliers, kfs, mps), then a summary.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu import config
from orb_slam2_tpu.io import evaluate, synthetic
from orb_slam2_tpu.pipeline.system import SLAM
from orb_slam2_tpu.pipeline.tracking import (HUD_N_INLIERS, HUD_N_KF,
                                             HUD_NEED_KF, HUD_STATUS,
                                             NOT_INITIALIZED, OK)


def block(x):
    jax.block_until_ready(x)
    return x


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "120"))
    cfg = config.SLAMConfig()
    seq = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=500,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)

    stage_t = {"frame": [], "track": [], "kf": [], "bow": [], "loop": [],
               "other": []}
    statuses = []

    for f in range(n_frames):
        img = jnp.asarray(seq.images[f], jnp.float32)
        t_all0 = time.perf_counter()
        t0 = time.perf_counter()
        frame = block(slam._frame_fn(img, slam.frame_count, seq.timestamps[f]))
        t1 = time.perf_counter()
        if slam.status == NOT_INITIALIZED:  # mirrors SLAM._track
            slam._initialize(frame)
            slam.frame_count += 1
            statuses.append(("init", slam.status))
            stage_t["frame"].append(t1 - t0)
            continue
        state, ts, cur_pids, hud = slam._track_step(slam.state, slam.ts, frame)
        hud = np.asarray(hud)
        t2 = time.perf_counter()
        slam.state, slam.ts = state, ts
        slam.last_hud = hud
        slam.status = int(hud[HUD_STATUS])
        tkf = tbow = tloop = 0.0
        if slam.status != OK:
            statuses.append(("LOST", int(hud[HUD_N_INLIERS])))
            if int(hud[HUD_N_KF]) <= 5:
                slam.reset()
            elif slam._transform is not None:
                slam._relocalize(frame)
        else:
            statuses.append(("ok", int(hud[HUD_N_INLIERS])))
            if hud[HUD_NEED_KF]:
                t3 = time.perf_counter()
                slam.state, slam.ts = slam._keyframe_step(
                    slam.state, slam.ts, frame, cur_pids)
                block(slam.state.kf_pose)
                tkf = time.perf_counter() - t3
                kf_id = int(slam.ts.ref_kf)
                if slam._transform is not None:
                    t4 = time.perf_counter()
                    slam.state = slam._set_bow(slam.state, slam.ts.ref_kf,
                                               frame.desc, frame.valid)
                    block(slam.state.kf_bow)
                    tbow = time.perf_counter() - t4
                    t5 = time.perf_counter()
                    if slam.enable_loop:
                        slam._try_close_loop(kf_id)
                    tloop = time.perf_counter() - t5
        slam.frame_count += 1
        t_end = time.perf_counter()
        stage_t["frame"].append(t1 - t0)
        stage_t["track"].append(t2 - t1)
        stage_t["kf"].append(tkf)
        stage_t["bow"].append(tbow)
        stage_t["loop"].append(tloop)
        stage_t["other"].append(t_end - t_all0 - (t1 - t0) - (t2 - t1)
                                - tkf - tbow - tloop)

    print("\n=== status log ===")
    for i, s in enumerate(statuses):
        print(i, s)

    print("\n=== stage timings (median of frames 10+, ms) ===")
    for k, v in stage_t.items():
        arr = np.asarray(v[10:]) * 1000 if len(v) > 10 else np.asarray(v) * 1000
        if len(arr):
            print(f"{k:8s} med={np.median(arr):8.2f}  mean={arr.mean():8.2f}  "
                  f"max={arr.max():8.2f}  sum={arr.sum()/1000:6.2f}s")

    est = slam.poses_twc()
    est_t = slam.timestamps()
    ie, ig = evaluate.match_timestamps(est_t, seq.timestamps)
    ate = (evaluate.ate_rmse(est[ie], seq.poses_twc[ig], align_scale=True)
           if len(ie) >= 10 else float("nan"))
    print(f"\ntracked={len(ie)}/{n_frames} kfs={int(slam.state.n_kf)} "
          f"mps={int(slam.state.n_mp)} ate={ate:.4f}")


if __name__ == "__main__":
    main()

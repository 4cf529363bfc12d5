"""Diagnose loop-closure behavior on the synthetic loop sequence: per-KF
candidate detection, consistency accumulation, and Sim3 verification stats.

Run with SLAM_PLATFORM=cpu:8 (or on the chip)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from orb_slam2_tpu.utils.platform import force_cpu_if_requested

force_cpu_if_requested()

import jax
import jax.numpy as jnp

from orb_slam2_tpu import config as config_mod
from orb_slam2_tpu.io import synthetic
from orb_slam2_tpu.pipeline.system import SLAM


def small_cfg():
    cam = config_mod.CameraConfig(
        fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240,
        fps=30.0, bf=0.0, th_depth=35.0)
    orb = config_mod.ORBConfig(n_features=500, max_keypoints=512)
    cap = config_mod.Capacity(
        max_keyframes=96, max_points=6144, max_obs_per_kf=512,
        max_frames=512, local_ba_points=2048)
    import dataclasses
    if os.environ.get("DIAG_DEFAULTS", "0") == "1":
        loop = config_mod.LoopConfig()   # exactly what test_e2e uses
    else:
        loop = dataclasses.replace(config_mod.LoopConfig(), min_bow_matches=15,
                                   min_sim3_inliers=12,
                                   sim3_ransac_min_inliers=12,
                                   min_total_matches=30)
    return config_mod.SLAMConfig(sensor=0, camera=cam, orb=orb, cap=cap,
                                 loop=loop)


def main():
    n_frames = int(os.environ.get("FRAMES", "140"))
    cfg = small_cfg()
    seq = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=300,
                             trajectory="loop", seed=1,
                             loop_revolutions=float(
                                 os.environ.get("REVS", "1.3")))
    slam = SLAM(cfg)

    # instrument: wrap _schedule_loop_detect / _check_loops
    orig_sched = slam._schedule_loop_detect

    def sched(kf_id):
        orig_sched(kf_id)
        if slam._loop_pending:
            fid, k, ids, groups = slam._loop_pending[-1]
            if k == kf_id:
                print(f"  detect kf={kf_id}: cands={np.asarray(ids).tolist()}")

    slam._schedule_loop_detect = sched

    orig_verify = slam._loop_verify

    def verify(state, k, c, key):
        out = orig_verify(state, k, c, key)
        ok, Scm, lp, stats = out
        print(f"  verify kf={int(k)} cand={int(c)}: ok={bool(ok)} "
              f"n_bow/n_inl/n_total={np.asarray(stats).tolist()}")
        return out

    slam._loop_verify = verify

    for f in range(n_frames):
        slam.track_mono(seq.images[f], seq.timestamps[f])
        if f % 10 == 0:
            slam.flush()
            print(f"frame {f}: status={slam.status} kf={int(slam.state.n_kf)} "
                  f"mp={int(slam.state.n_mp)} loop_kf={slam.last_loop_kf} "
                  f"consist={[(sorted(s)[:3], c) for s, c in slam._consistency.prev]}",
                  flush=True)
    slam.flush()
    print("final loop_kf:", slam.last_loop_kf)


if __name__ == "__main__":
    main()

"""Per-frame wall-time profile of the production SLAM pipeline (the real
`SLAM` class, fused async path) on the synthetic benchmark sequence.

Prints per frame: wall ms, status (lagged host mirror), #KF, #MP, and a
trailing summary splitting keyframe-insertion frames from plain frames.

Env: BENCH_FRAMES (default 120), BENCH_TRAJ (xyz), SLAM_PLATFORM=cpu[:N].
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from orb_slam2_tpu.utils.platform import force_cpu_if_requested

force_cpu_if_requested()

import jax

from orb_slam2_tpu import config
from orb_slam2_tpu.io import evaluate, synthetic
from orb_slam2_tpu.pipeline.system import SLAM
from orb_slam2_tpu.pipeline.tracking import HUD_N_INLIERS, HUD_NEED_KF


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "120"))
    traj = os.environ.get("BENCH_TRAJ", "xyz")
    cfg = config.SLAMConfig()
    t0 = time.perf_counter()
    seq = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=500,
                             trajectory=traj, seed=0)
    print(f"generate: {time.perf_counter() - t0:.1f}s", flush=True)

    slam = SLAM(cfg)
    # capture every HUD record with the frame id it belongs to
    hud_log = {}
    orig_drain = slam._drain

    def logging_drain(keep):
        before = list(slam._pending)
        n_before = len(before)
        orig_drain(keep)
        consumed = n_before - len(slam._pending)
        for fid, hud, _ in before[:consumed]:
            hud_log[fid] = np.asarray(hud)

    slam._drain = logging_drain

    rows = []
    for f in range(n_frames):
        t0 = time.perf_counter()
        slam.track_mono(seq.images[f], seq.timestamps[f])
        dt = (time.perf_counter() - t0) * 1000
        rows.append([f, dt])
    slam.flush()

    print("frame   ms  status inl kf?")
    for f, dt in rows:
        h = hud_log.get(f)
        st = int(h[0]) if h is not None else -1
        inl = int(h[HUD_N_INLIERS]) if h is not None else -1
        kf = int(h[HUD_NEED_KF]) if h is not None else 0
        rows[f] = (f, dt, st, inl, kf)
        print(f"{f:5d} {dt:7.1f} {st:3d} {inl:4d} {kf}")

    est = slam.poses_twc()
    est_t = slam.timestamps()
    ie, ig = evaluate.match_timestamps(est_t, seq.timestamps)
    ate = (evaluate.ate_rmse(est[ie], seq.poses_twc[ig], align_scale=True)
           if len(ie) >= 10 else float("nan"))
    times = np.array([r[1] for r in rows[10:]])
    kf_flags = np.array([r[4] for r in rows[10:]], bool)
    print(f"\ntracked {len(ie)}/{n_frames}  ATE {ate*100:.2f} cm  "
          f"KFs {int(slam.state.n_kf)}  MPs {int(slam.state.n_mp)}")
    print(f"median all {np.median(times):.1f} ms   "
          f"plain {np.median(times[~kf_flags]) if (~kf_flags).any() else 0:.1f} ms  "
          f"kf-frames {np.median(times[kf_flags]) if kf_flags.any() else 0:.1f} ms  "
          f"({kf_flags.sum()} kf frames)")
    print(f"p90 {np.percentile(times, 90):.1f}  max {times.max():.1f}")


if __name__ == "__main__":
    main()

"""Robustness diagnostic: run the real SLAM loop on the synthetic bench
sequence and log the per-frame HUD (status / inliers / need_kf / kfs / mps)
to find where and why tracking is lost.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from orb_slam2_tpu.utils import force_cpu_if_requested
force_cpu_if_requested()

from orb_slam2_tpu import config
from orb_slam2_tpu.io import evaluate, synthetic
from orb_slam2_tpu.pipeline.system import SLAM

STATUS = {0: "NOIMG", 1: "INIT", 2: "OK", 3: "LOST"}


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "120"))
    cfg = config.SLAMConfig()
    seq = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=500,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)
    for f in range(n_frames):
        prev = slam.status
        slam.track_mono(seq.images[f], seq.timestamps[f])
        h = slam.last_hud
        print(f"f={f:3d} {STATUS[prev]:5s}->{STATUS[slam.status]:5s} "
              f"inl={int(h[1]):4d} needkf={int(h[2])} kfs={int(h[3]):3d} "
              f"mps={int(h[4]):5d}", flush=True)

    est = slam.poses_twc()
    est_t = slam.timestamps()
    ie, ig = evaluate.match_timestamps(est_t, seq.timestamps)
    ate = (evaluate.ate_rmse(est[ie], seq.poses_twc[ig], align_scale=True)
           if len(ie) >= 10 else float("nan"))
    print(f"tracked={len(ie)}/{n_frames} kfs={int(slam.state.n_kf)} "
          f"mps={int(slam.state.n_mp)} ate={ate:.4f}")


if __name__ == "__main__":
    main()

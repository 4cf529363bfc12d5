"""Driver benchmark: tracked frames/s/chip on a synthetic mono sequence.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline: the reference ORB-SLAM2 runs "real-time" on an i7 — its examples
pace to the dataset rate (30 fps TUM, BASELINE.md), and the TRO-2017 paper
reports ~25-40 ms/frame tracking.  vs_baseline therefore compares our
per-chip tracked frames/s against 30 fps.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax
    from orb_slam2_tpu import config
    from orb_slam2_tpu.io import evaluate, synthetic
    from orb_slam2_tpu.pipeline.system import SLAM

    n_frames = int(os.environ.get("BENCH_FRAMES", "120"))
    cfg = config.SLAMConfig()
    seq = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=500,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)
    for f in range(n_frames):
        slam.track_mono(seq.images[f], seq.timestamps[f])

    est = slam.poses_twc()
    est_t = slam.timestamps()
    ie, ig = evaluate.match_timestamps(est_t, seq.timestamps)
    ate_m = (evaluate.ate_rmse(est[ie], seq.poses_twc[ig], align_scale=True)
             if len(ie) >= 10 else float("nan"))

    # steady-state tracking time: drop the first 10 frames (compile/warmup)
    times = np.asarray(slam.timings[10:])
    med = float(np.median(times)) if len(times) else float("nan")
    fps = 1.0 / med if med > 0 else 0.0

    print(json.dumps({
        "metric": "tracked_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "ate_rmse_m": round(ate_m, 4) if ate_m == ate_m else None,
        "tracked_frames": int(len(ie)),
        "total_frames": n_frames,
        "keyframes": int(slam.state.n_kf),
        "map_points": int(slam.state.n_mp),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({
            "metric": "tracked_frames_per_s_per_chip",
            "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300]}))
        sys.exit(0)

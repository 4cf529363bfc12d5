"""End-to-end SLAM run on a synthetic sequence with ground truth.

Usage: python examples/run_synthetic.py [--sensor mono|rgbd|stereo]
       [--frames 120] [--points 1500]
"""

import argparse
import sys
import time

import numpy as np

from orb_slam2_tpu import config
from orb_slam2_tpu.io import evaluate, synthetic
from orb_slam2_tpu.pipeline.system import SLAM


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sensor", default="mono",
                    choices=["mono", "rgbd", "stereo"])
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--points", type=int, default=1500)
    ap.add_argument("--trajectory", default="xyz", choices=["xyz", "forward"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save", default=None)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    import faulthandler
    faulthandler.dump_traceback_later(600, repeat=True)

    sensor = dict(mono=config.MONOCULAR, rgbd=config.RGBD,
                  stereo=config.STEREO)[args.sensor]
    cam = config.CameraConfig(bf=40.0 if sensor != config.MONOCULAR else 0.0)
    cfg = config.SLAMConfig(sensor=sensor, camera=cam)

    print(f"generating synthetic sequence ({args.frames} frames)...")
    seq = synthetic.generate(cam, n_frames=args.frames, n_points=args.points,
                             trajectory=args.trajectory, seed=args.seed)
    if sensor == config.STEREO:
        right = synthetic.stereo_right_images(seq, cam)

    slam = SLAM(cfg)
    t0 = time.time()
    for f in range(args.frames):
        if sensor == config.MONOCULAR:
            slam.track_mono(seq.images[f], seq.timestamps[f])
        elif sensor == config.RGBD:
            slam.track_rgbd(seq.images[f], seq.depths[f], seq.timestamps[f])
        else:
            slam.track_stereo(seq.images[f], right[f], seq.timestamps[f])
        if args.verbose or f % 20 == 0:
            h = slam.last_hud
            print(f"  frame {f}: status={slam.status} inl={h[1]} "
                  f"needkf={h[2]} kf={h[3]} mp={h[4]} "
                  f"t={slam.timings[-1]*1000:.0f}ms", flush=True)
    wall = time.time() - t0

    est = slam.poses_twc()
    est_t = slam.timestamps()
    ie, ig = evaluate.match_timestamps(est_t, seq.timestamps)
    if len(ie) < 10:
        print(f"FAILED: only {len(ie)} tracked frames")
        sys.exit(1)
    ate = evaluate.ate_rmse(est[ie], seq.poses_twc[ig],
                            align_scale=(sensor == config.MONOCULAR))
    med_ms = float(np.median(slam.timings) * 1000)
    print(f"tracked {len(ie)}/{args.frames} frames")
    print(f"ATE RMSE: {ate*100:.2f} cm")
    print(f"median track time: {med_ms:.1f} ms  ({1000/med_ms:.1f} fps)  "
          f"wall {wall:.1f}s")
    print(f"keyframes: {int(slam.state.n_kf)}  map points: {int(slam.state.n_mp)}")
    if args.save:
        slam.save_trajectory_tum(args.save)
        print("saved", args.save)


if __name__ == "__main__":
    main()

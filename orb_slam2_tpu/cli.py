"""Command-line interface: the equivalents of the reference's six example
binaries (mono_tum, mono_kitti, mono_euroc, stereo_kitti, stereo_euroc,
rgbd_tum — Examples/, CMakeLists.txt:85-112) plus the synthetic benchmark
sequence, behind one entry point:

    tpu-slam run --dataset tum --sensor mono --path <seq> [--settings x.yaml]
    tpu-slam run --dataset synthetic --sensor mono --frames 120
    tpu-slam bench
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def _build_cfg(args):
    from orb_slam2_tpu import config as cfg_mod
    sensor = dict(mono=cfg_mod.MONOCULAR, stereo=cfg_mod.STEREO,
                  rgbd=cfg_mod.RGBD)[args.sensor]
    if args.settings:
        from orb_slam2_tpu.io.settings import load_settings
        return load_settings(args.settings, sensor)
    if args.dataset == "kitti":
        return cfg_mod.kitti_config()
    if args.dataset == "euroc":
        return cfg_mod.euroc_config()
    if args.dataset == "tum":
        return cfg_mod.tum1_config(sensor)
    cam = cfg_mod.CameraConfig(bf=40.0 if sensor != cfg_mod.MONOCULAR else 0.0)
    return cfg_mod.SLAMConfig(sensor=sensor, camera=cam)


def cmd_run(args):
    from orb_slam2_tpu import config as cfg_mod
    from orb_slam2_tpu.pipeline.system import SLAM

    cfg = _build_cfg(args)
    slam = SLAM(cfg)

    if args.dataset == "synthetic":
        from orb_slam2_tpu.io import evaluate, synthetic
        seq = synthetic.generate(cfg.camera, n_frames=args.frames,
                                 n_points=args.points,
                                 trajectory=args.trajectory, seed=args.seed)
        right = (synthetic.stereo_right_images(seq, cfg.camera)
                 if args.sensor == "stereo" else None)
        t0 = time.time()
        for f in range(args.frames):
            if args.sensor == "mono":
                slam.track_mono(seq.images[f], seq.timestamps[f])
            elif args.sensor == "rgbd":
                slam.track_rgbd(seq.images[f], seq.depths[f],
                                seq.timestamps[f])
            else:
                slam.track_stereo(seq.images[f], right[f], seq.timestamps[f])
        wall = time.time() - t0
        est = slam.poses_twc()
        est_t = slam.timestamps()
        ie, ig = evaluate.match_timestamps(est_t, seq.timestamps)
        ate = (evaluate.ate_rmse(est[ie], seq.poses_twc[ig],
                                 align_scale=args.sensor == "mono")
               if len(ie) >= 10 else float("nan"))
        med = float(np.median(slam.timings[10:]) * 1000) if len(
            slam.timings) > 10 else float("nan")
        print(f"tracked {len(ie)}/{args.frames}  ATE RMSE {ate*100:.2f} cm  "
              f"median {med:.1f} ms/frame  wall {wall:.1f}s")
    else:
        from orb_slam2_tpu.io import datasets
        if args.dataset == "tum" and args.sensor == "mono":
            items = datasets.load_tum_mono(args.path)
        elif args.dataset == "tum":
            items = datasets.load_tum_rgbd(args.path, args.associations)
        elif args.dataset == "kitti":
            items = datasets.load_kitti_stereo(args.path)
        else:
            items = datasets.load_euroc_stereo(args.path)
        rectify = None
        if args.dataset == "euroc" and args.settings:
            rectify = datasets.euroc_rectify_maps(args.settings)
        reader = datasets.SequenceReader(
            items, args.sensor, depth_factor=cfg.camera.depth_map_factor,
            rectify=rectify)
        print(f"{len(reader)} frames")
        for i, frame_data in enumerate(reader):
            if args.sensor == "mono":
                img, t = frame_data
                slam.track_mono(img, t)
            elif args.sensor == "rgbd":
                img, depth, t = frame_data
                slam.track_rgbd(img, depth, t)
            else:
                l, r, t = frame_data
                slam.track_stereo(l, r, t)
            if args.max_frames and i + 1 >= args.max_frames:
                break
        med = float(np.median(slam.timings[10:]) * 1000)
        print(f"median track time {med:.1f} ms/frame")

    out = args.output or "CameraTrajectory.txt"
    if args.dataset == "kitti":
        slam.save_trajectory_kitti(out)
    else:
        slam.save_trajectory_tum(out)
    print("trajectory saved to", out)


def cmd_view(args):
    """Render a saved map checkpoint / trajectory to an image (the headless
    equivalent of the reference Pangolin viewer, Viewer.cc / MapDrawer.cc)."""
    import numpy as np
    from orb_slam2_tpu.viz import render_map, render_trajectory
    traj = None
    if args.traj:
        rows = np.loadtxt(args.traj)
        # TUM format: t tx ty tz qx qy qz qw -> [F, 7] wxyz + t
        traj = np.concatenate([rows[:, [7, 4, 5, 6]], rows[:, 1:4]], axis=1)
    if args.map:
        from orb_slam2_tpu.map.checkpoint import load_map
        state = load_map(args.map)
        out = render_map(state, args.out, traj=traj,
                         title=os.path.basename(args.map))
    elif traj is not None:
        out = render_trajectory(traj, args.out)
    else:
        print("need --map and/or --traj", file=sys.stderr)
        return
    print("wrote", out)


def cmd_bench(args):
    import subprocess
    os.execvp(sys.executable, [sys.executable,
                               os.path.join(os.path.dirname(__file__),
                                            "..", "bench.py")])


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpu-slam")
    sub = ap.add_subparsers(dest="cmd", required=True)
    run = sub.add_parser("run", help="run SLAM on a sequence")
    run.add_argument("--dataset", default="synthetic",
                     choices=["synthetic", "tum", "kitti", "euroc"])
    run.add_argument("--sensor", default="mono",
                     choices=["mono", "stereo", "rgbd"])
    run.add_argument("--path", help="dataset sequence directory")
    run.add_argument("--settings", help="reference-format YAML settings")
    run.add_argument("--associations", help="TUM RGB-D associations file")
    run.add_argument("--output", help="trajectory output path")
    run.add_argument("--frames", type=int, default=120)
    run.add_argument("--points", type=int, default=500)
    run.add_argument("--trajectory", default="xyz", choices=["xyz", "forward"])
    run.add_argument("--seed", type=int, default=0)
    run.add_argument("--max-frames", type=int, default=0)
    run.set_defaults(fn=cmd_run)
    bench = sub.add_parser("bench", help="run the driver benchmark")
    bench.set_defaults(fn=cmd_bench)
    view = sub.add_parser("view", help="render a map/trajectory image")
    view.add_argument("--map", help="map checkpoint (npz from save_map)")
    view.add_argument("--traj", help="TUM-format trajectory file")
    view.add_argument("--out", default="map.png")
    view.set_defaults(fn=cmd_view)
    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

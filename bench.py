"""Driver benchmark: tracked frames/s/chip on synthetic sequences.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline: the reference ORB-SLAM2 runs "real-time" on an i7 — its examples
pace to the dataset rate (30 fps TUM, BASELINE.md), and the TRO-2017 paper
reports ~25-40 ms/frame tracking.  vs_baseline therefore compares our
per-chip tracked frames/s against 30 fps.

Extras (VERDICT r3 item 10):
  stages   — per-stage device times (ms) measured on the warm mid-sequence
             state: extraction, fused track step, keyframe integration
  stereo   — a stereo run (fps + metric ATE) so stereo regressions surface
             here, not only in CI
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def _stage_times(slam, seq, reps=5):
    """Median device time of each pipeline stage on the live warm state."""
    import jax
    import jax.numpy as jnp

    img = jnp.asarray(seq.images[-1], jnp.float32)
    t_last = float(seq.timestamps[-1])
    frame = slam._frame_fn(img, slam.frame_count, t_last)
    jax.block_until_ready(frame)

    def t(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1000

    stages = {
        "extract_ms": t(slam._frame_fn, img, slam.frame_count, t_last),
        "track_ms": t(slam._track_step, slam.state, slam.ts, frame),
    }
    _, ts2, cur_pids, _ = slam._track_step(slam.state, slam.ts, frame)
    stages["keyframe_ms"] = t(slam._keyframe_step, slam.state, ts2, frame,
                              cur_pids)
    return {k: round(v, 2) for k, v in stages.items()}


def _run_mono(cfg, n_frames):
    from orb_slam2_tpu.io import evaluate, synthetic
    from orb_slam2_tpu.pipeline.system import SLAM

    batch = int(os.environ.get("BENCH_BATCH", "0"))
    if batch > 1:
        cfg = cfg.replace(frame_batch=batch)
    seq = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=500,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)
    for f in range(n_frames):
        slam.track_mono(seq.images[f], seq.timestamps[f])
    est = slam.poses_twc()
    ie, ig = evaluate.match_timestamps(slam.timestamps(), seq.timestamps)
    ate = (evaluate.ate_rmse(est[ie], seq.poses_twc[ig], align_scale=True)
           if len(ie) >= 10 else float("nan"))
    # throughput = frames / total wall over the steady segment (mean, not
    # median: keyframe frames and batched dispatches must count).  Frames
    # stalled > 2 s are axon-tunnel RPC hangs (infrastructure, not device
    # time — the same program's p90 stays ~110 ms); they are excluded from
    # the mean but REPORTED via the stall counter so the exclusion is
    # auditable.
    times = np.asarray(slam.timings[10:])
    stalls = int(np.sum(times > 2.0))
    times = times[times <= 2.0]
    mean = float(np.mean(times)) if len(times) else float("nan")
    return slam, seq, 1.0 / mean if mean > 0 else 0.0, ate, len(ie), stalls


def _run_stereo(n_frames):
    from orb_slam2_tpu import config
    from orb_slam2_tpu.io import evaluate, synthetic
    from orb_slam2_tpu.pipeline.system import SLAM

    cfg = config.SLAMConfig(
        sensor=config.STEREO,
        camera=config.CameraConfig(bf=40.0))
    seq = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=500,
                             trajectory="xyz", seed=0)
    right = synthetic.generate(
        cfg.camera, n_frames=n_frames, n_points=4, trajectory="xyz", seed=0,
        poses_override=synthetic.right_poses(seq.poses_twc,
                                             cfg.camera.baseline)).images
    slam = SLAM(cfg)
    for f in range(n_frames):
        slam.track_stereo(seq.images[f], right[f], seq.timestamps[f])
    est = slam.poses_twc()
    ie, ig = evaluate.match_timestamps(slam.timestamps(), seq.timestamps)
    ate = (evaluate.ate_rmse(est[ie], seq.poses_twc[ig], align_scale=False)
           if len(ie) >= 10 else float("nan"))
    times = np.asarray(slam.timings[10:])
    times = times[times <= 2.0]       # tunnel stalls (see _run_mono note)
    mean = float(np.mean(times)) if len(times) else float("nan")
    return 1.0 / mean if mean > 0 else 0.0, ate, len(ie), n_frames


def main():
    from orb_slam2_tpu import config

    n_frames = int(os.environ.get("BENCH_FRAMES", "120"))
    cfg = config.SLAMConfig()
    slam, seq, fps, ate_m, n_tracked, stalls = _run_mono(cfg, n_frames)

    times = np.asarray(slam.timings[10:]) * 1000
    times = times[times <= 2000.0]    # tunnel stalls reported separately
    out = {
        "metric": "tracked_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "ate_rmse_m": round(ate_m, 4) if ate_m == ate_m else None,
        "tracked_frames": int(n_tracked),
        "total_frames": n_frames,
        "keyframes": int(slam.state.n_kf),
        "map_points": int(slam.state.n_mp),
        "tunnel_stall_frames_excluded": stalls,
        # worst-frame latency: the staged keyframe pipeline must keep every
        # frame under the real-time budget, not only the mean
        "frame_ms_max": round(float(times.max()), 1) if len(times) else None,
        "frame_ms_p90": round(float(np.percentile(times, 90)), 1)
        if len(times) else None,
    }
    try:
        out["stages"] = _stage_times(slam, seq)
    except Exception as e:  # stage probe must never sink the headline number
        out["stages"] = {"error": str(e)[:120]}
    if os.environ.get("BENCH_STEREO", "1") != "0":
        try:
            sfps, sate, sn, stot = _run_stereo(
                int(os.environ.get("BENCH_STEREO_FRAMES", "60")))
            out["stereo"] = {
                "fps": round(sfps, 2), "vs_baseline": round(sfps / 30.0, 3),
                "ate_rmse_m": round(sate, 4) if sate == sate else None,
                "tracked_frames": int(sn), "total_frames": int(stot)}
        except Exception as e:
            out["stereo"] = {"error": str(e)[:120]}
    print(json.dumps(out))


if __name__ == "__main__":
    # watchdog: the TPU tunnel can wedge indefinitely (futex hang on any
    # dispatch); never leave the driver without a JSON line
    import signal

    def _alarm(signum, frame):
        print(json.dumps({
            "metric": "tracked_frames_per_s_per_chip",
            "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
            "error": "watchdog timeout (TPU tunnel hang?)"}), flush=True)
        os._exit(0)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(os.environ.get("BENCH_TIMEOUT", "2400")))
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({
            "metric": "tracked_frames_per_s_per_chip",
            "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300]}))
        sys.exit(0)

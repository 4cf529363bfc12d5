"""Streamed (throughput-style) timing of track-step internals on the live
backend: dispatch N repetitions back-to-back and block once, so the tunnel's
per-call blocking latency (~80 ms) doesn't mask the real device cost."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from orb_slam2_tpu.utils.platform import force_cpu_if_requested

force_cpu_if_requested()

import jax
import jax.numpy as jnp

from orb_slam2_tpu import config
from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.io import synthetic
from orb_slam2_tpu.pipeline import tracking
from orb_slam2_tpu.pipeline.system import SLAM
from orb_slam2_tpu.solvers import pose_opt


def stream_time(name, fn, *args, n=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:32s} {(time.perf_counter() - t0) / n * 1000:8.2f} ms",
          flush=True)


def main():
    cfg = config.SLAMConfig()
    seq = synthetic.generate(cfg.camera, n_frames=40, n_points=400,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)
    for f in range(40):
        slam.track_mono(seq.images[f], seq.timestamps[f])
    slam.flush()
    print("warm:", slam.status, int(slam.state.n_kf), int(slam.state.n_mp))

    state, ts = slam.state, slam.ts
    frame = slam._frame_fn(jnp.asarray(seq.images[39], jnp.float32),
                           39, seq.timestamps[39])
    K = camera.intrinsics(cfg.camera)
    bf = cfg.camera.bf

    stream_time("frame_fn", lambda im: slam._frame_fn(im, 39, np.float64(1.3)),
                jnp.asarray(seq.images[39], jnp.float32))
    stream_time("track_step", lambda s, t, f_: slam._track_step(s, t, f_),
                state, ts, frame)
    stream_time("motion_model",
                lambda s, t, f_: tracking.track_with_motion_model(s, t, f_, cfg),
                state, ts, frame)
    stream_time("ref_kf",
                lambda s, t, f_: tracking.track_reference_keyframe(s, t, f_, cfg),
                state, ts, frame)
    stream_time("local_map",
                lambda s, t, f_: tracking.track_local_map(
                    s, t, f_, t.T, t.last_pids, cfg, jnp.asarray(False)),
                state, ts, frame)

    inv_sigma2 = 1.0 / (cfg.orb.scale_factor ** 2) ** frame.octave.astype(jnp.float32)
    pw = state.mp_pos[jnp.clip(ts.last_pids, 0, None)]
    valid = (ts.last_pids >= 0) & frame.valid
    stream_time("pose_optimize (4x10)",
                lambda: pose_opt.pose_optimize(
                    ts.T, pw, frame.uv, frame.ur, inv_sigma2, valid,
                    frame.ur >= 0, K, bf, cfg.ba))
    stream_time("full_step",
                lambda s, t: slam._full_step(
                    s, t, (jnp.asarray(seq.images[39], jnp.float32),),
                    np.int64(39), seq.timestamps[39], jnp.asarray(False)),
                state, ts)


if __name__ == "__main__":
    main()

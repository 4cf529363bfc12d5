"""Chained (pipeline-friendly) device timing of the per-frame path.

Per-rep block_until_ready measures tunnel round-trips, not device time;
this script instead chains N dependent dispatches and blocks once, giving
true steady-state device ms/frame for: frame_fn alone, track_step alone,
full_step, and full_step's keyframe branch.

Env: WARM (default 40), N (default 30).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

from orb_slam2_tpu.utils.platform import force_cpu_if_requested

force_cpu_if_requested()

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu import config
from orb_slam2_tpu.io import synthetic
from orb_slam2_tpu.pipeline.system import SLAM

WARM = int(os.environ.get("WARM", "40"))
N = int(os.environ.get("N", "30"))


def main():
    cfg = config.SLAMConfig()
    seq = synthetic.generate(cfg.camera, n_frames=WARM + 2, n_points=500,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)
    for f in range(WARM):
        slam.track_mono(seq.images[f], seq.timestamps[f])
    slam.flush()
    print(f"warm: {int(slam.state.n_kf)} KFs {int(slam.state.n_mp)} MPs")

    state, ts = slam.state, slam.ts
    img = jnp.asarray(seq.images[WARM], jnp.float32)
    loc = jnp.asarray(False)
    frame0 = slam._frame_fn(img, slam.frame_count, 1.0)
    jax.block_until_ready(frame0)

    def chain(name, fn, init, deps):
        """fn(carry, i) -> carry; block once after N chained dispatches."""
        c = fn(init, 0)
        jax.block_until_ready(jax.tree.leaves(c)[0])
        t0 = time.perf_counter()
        c = init
        for i in range(N):
            c = fn(c, i)
        jax.block_until_ready(jax.tree.leaves(c)[0])
        print(f"{name:28s} {(time.perf_counter() - t0) / N * 1000:8.1f} ms")

    # frame_fn chained: feed a pixel of the previous output back in so the
    # calls serialize on device
    def f_frame(carry, i):
        fr = slam._frame_fn(img + carry, i, 1.0)
        return fr.uv[0, 0] * 0.0

    chain("frame_fn (chained)", f_frame, jnp.float32(0.0), None)

    def f_track(carry, i):
        st, t2 = carry
        st, t2, _, hud = slam._track_step(st, t2, frame0)
        return (st, t2)

    chain("track_step (chained)", f_track, (state, ts), None)

    def f_full(carry, i):
        st, t2 = carry
        st, t2, _, hud = slam._full_step(st, t2, (img,), WARM + 1 + i,
                                         1.0 + 0.03 * i, loc)
        return (st, t2)

    chain("full_step (chained)", f_full, (state, ts), None)

    # keyframe branch cost: run the standalone keyframe_step chained
    _, ts2, cur_pids, _ = slam._track_step(state, ts, frame0)

    def f_kf(carry, i):
        st, t2 = slam._keyframe_step(carry[0], ts2, frame0, cur_pids)
        return (st, t2)

    chain("keyframe_step (chained)", f_kf, (state, ts2), None)


if __name__ == "__main__":
    main()

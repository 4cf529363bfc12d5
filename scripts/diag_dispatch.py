"""Measure per-dispatch overhead of the fused full_step through the device
tunnel: async chained dispatches (no per-call block) vs blocked calls.

If the async rate is far below the device throughput of the constituent
stages, the tunnel dispatch itself is the bottleneck and the fix is chunking
multiple frames into one dispatch (lax.scan on device)."""

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
from orb_slam2_tpu.io import synthetic
from orb_slam2_tpu.pipeline.system import SLAM


def main():
    cfg = config.SLAMConfig()
    seq = synthetic.generate(cfg.camera, n_frames=40, n_points=400,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)
    for f in range(30):
        slam.track_mono(seq.images[f], seq.timestamps[f])
    slam.flush()
    print("warm:", slam.status, int(slam.state.n_kf), flush=True)

    state, ts = slam.state, slam.ts
    img = jnp.asarray(seq.images[30], jnp.float32)
    loc = jnp.asarray(False)
    fid = np.int64(30)
    t_ = seq.timestamps[30]  # np.float64: matches the warmed trace signature

    def step(state, ts, i):
        return slam._full_step(state, ts, (img,), fid, t_, loc)

    # warm this exact signature
    state2, ts2, frame, hud = step(state, ts, 0)
    jax.block_until_ready(ts2.T)

    for label, n, block_each in [("async chained", 30, False),
                                 ("blocked", 5, True),
                                 ("async chained x2", 30, False)]:
        s, t = state, ts
        t0 = time.perf_counter()
        for i in range(n):
            s, t, frame, hud = step(s, t, i)
            if block_each:
                jax.block_until_ready(t.T)
        jax.block_until_ready(t.T)
        dt = (time.perf_counter() - t0) / n * 1000
        print(f"{label:24s} {dt:8.2f} ms/frame", flush=True)

    # with per-frame hud d2h async read (the production pattern)
    from collections import deque
    s, t = state, ts
    pend = deque()
    t0 = time.perf_counter()
    n = 30
    for i in range(n):
        s, t, frame, hud = step(s, t, i)
        hud.copy_to_host_async()
        pend.append(hud)
        if len(pend) > 8:
            _ = np.asarray(pend.popleft())
    jax.block_until_ready(t.T)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{'chained + hud reads':24s} {dt:8.2f} ms/frame")


if __name__ == "__main__":
    main()

"""Decisive dispatch-vs-device experiment: time B tracked frames as

  (a) B chained `full_step` dispatches (current per-frame path), vs
  (b) ONE jit containing `lax.scan` over the B frames (super-step).

If (b) << (a) per frame, per-program tunnel/runtime overhead dominates and
frame batching is the throughput lever; if (b) ~= (a), the device compute
itself is the cost and kernel work is the lever.
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
B = int(os.environ.get("B", "16"))


def main():
    cfg = config.SLAMConfig()
    seq = synthetic.generate(cfg.camera, n_frames=WARM + B + 2, n_points=500,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)
    for f in range(WARM):
        slam.track_mono(seq.images[f], seq.timestamps[f])
    slam.flush()
    print(f"warm: {int(slam.state.n_kf)} KFs", flush=True)

    state, ts = slam.state, slam.ts
    imgs = jnp.asarray(seq.images[WARM:WARM + B], jnp.float32)   # [B, H, W]
    fids = jnp.arange(WARM, WARM + B, dtype=jnp.int32)
    tss = jnp.asarray(seq.timestamps[WARM:WARM + B], jnp.float32)
    loc = jnp.asarray(False)

    # (a) chained dispatches
    def run_chain():
        st, t2 = state, ts
        for i in range(B):
            st, t2, _, hud = slam._full_step(st, t2, (imgs[i],), WARM + i,
                                             float(i), loc)
        return hud

    jax.block_until_ready(run_chain())
    t0 = time.perf_counter()
    jax.block_until_ready(run_chain())
    ta = (time.perf_counter() - t0) / B * 1000
    print(f"(a) chained dispatches: {ta:7.1f} ms/frame", flush=True)

    # (b) one scan program
    @jax.jit
    def super_step(state, ts, imgs, fids, tss):
        def body(carry, x):
            st, t2 = carry
            img, fid, t = x
            st, t2, _, hud = slam._full_step_raw(st, t2, (img,), fid, t, loc)
            return (st, t2), hud

        (state, ts), huds = jax.lax.scan(body, (state, ts), (imgs, fids, tss))
        return state, ts, huds

    out = super_step(state, ts, imgs, fids, tss)
    jax.block_until_ready(out[2])
    t0 = time.perf_counter()
    out = super_step(state, ts, imgs, fids, tss)
    jax.block_until_ready(out[2])
    tb = (time.perf_counter() - t0) / B * 1000
    print(f"(b) scan super-step:    {tb:7.1f} ms/frame", flush=True)
    print(f"batching speedup: {ta / tb:.2f}x")


if __name__ == "__main__":
    main()

"""Bisect which SLAM phase degrades the device into ~50ms-per-execution
mode: time a tiny probe program after each phase."""

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
from orb_slam2_tpu.frontend import extractor
from orb_slam2_tpu.io import synthetic
from orb_slam2_tpu.pipeline.system import SLAM

cfg = config.SLAMConfig()
probe = jax.jit(extractor.build_extractor(cfg.orb, cfg.camera.height,
                                          cfg.camera.width))
rng = np.random.RandomState(0)
img = jnp.asarray((rng.rand(cfg.camera.height, cfg.camera.width) * 255)
                  .astype(np.float32))


def probe_time(label, n=20):
    out = probe(img)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = probe(img)
    jax.block_until_ready(out)
    print(f"probe after {label:28s} {(time.perf_counter() - t0) / n * 1000:8.2f} ms",
          flush=True)


def main():
    probe_time("nothing")
    seq = synthetic.generate(cfg.camera, n_frames=40, n_points=300,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)
    probe_time("SLAM() ctor")
    for f in range(12):
        slam.track_mono(seq.images[f], seq.timestamps[f])
    slam.flush()
    print("  status", slam.status, "kf", int(slam.state.n_kf))
    probe_time("init (12 frames)")
    for f in range(12, 20):
        slam.track_mono(seq.images[f], seq.timestamps[f])
    slam.flush()
    probe_time("8 more frames")
    for f in range(20, 40):
        slam.track_mono(seq.images[f], seq.timestamps[f])
    slam.flush()
    print("  status", slam.status, "kf", int(slam.state.n_kf))
    probe_time("40 frames total")
    del slam
    import gc
    gc.collect()
    probe_time("del slam + gc")


if __name__ == "__main__":
    main()

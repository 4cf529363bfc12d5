"""Finer bisect: which jitted program's execution degrades the tunnel to
~50ms/execution for everything afterwards."""

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
    seq = synthetic.generate(cfg.camera, n_frames=14, n_points=300,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)
    frames = []
    for f in range(3):
        fr = slam._frame_fn(jnp.asarray(seq.images[f], jnp.float32), f,
                            seq.timestamps[f])
        jax.block_until_ready(fr.uv)
        frames.append(fr)
    probe_time("frame_fn x3")
    ts = slam._store_init(slam.ts, frames[0])
    jax.block_until_ready(ts.init_uv)
    probe_time("store_init")
    m = slam._match_init(ts, frames[1])
    jax.block_until_ready(m.idx)
    probe_time("match_init")
    key = jax.random.PRNGKey(0)
    st, ts2, ok = slam._create_mono_map(slam.state, ts, frames[2], m.idx, key)
    jax.block_until_ready(ts2.T)
    print("  create_mono_map ok:", bool(ok))
    probe_time("create_mono_map")
    st2 = slam._global_ba(st)
    jax.block_until_ready(st2.kf_pose)
    probe_time("global_ba")
    st3 = slam._set_bow(st2, jnp.asarray(1), frames[2].desc, frames[2].valid)
    jax.block_until_ready(st3.kf_bow)
    probe_time("set_bow")
    out = slam._full_step(st3, ts2,
                          (jnp.asarray(seq.images[3], jnp.float32),),
                          3, seq.timestamps[3], jnp.asarray(False))
    jax.block_until_ready(out[1].T)
    probe_time("full_step x1")


if __name__ == "__main__":
    main()

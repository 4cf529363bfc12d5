"""Chained profile of keyframe_step components on the TPU.

Builds a realistic warm mid-sequence map (30 frames of the bench synthetic
sequence on the default config), then times each keyframe-rate component as
dependent dispatches with all outputs consumed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu import config
from orb_slam2_tpu.io import synthetic
from orb_slam2_tpu.pipeline.system import SLAM
from orb_slam2_tpu.pipeline import mapping
from orb_slam2_tpu.map import ops
from orb_slam2_tpu.ba import local as ba_local

N = int(os.environ.get("N", "5"))
cfg = config.SLAMConfig()
seq = synthetic.generate(cfg.camera, n_frames=40, n_points=500,
                         trajectory="xyz", seed=0)
slam = SLAM(cfg)
for f in range(30):
    slam.track_mono(seq.images[f], seq.timestamps[f])
slam.flush()
print("map:", int(slam.state.n_kf), "kfs", int(slam.state.n_mp), "mps",
      flush=True)

img = jnp.asarray(seq.images[30], jnp.float32)
frame = slam._frame_fn(img, slam.frame_count, float(seq.timestamps[30]))
state0, ts0, cur_pids, _ = slam._track_step(slam.state, slam.ts, frame,
                                            jnp.asarray(False))
jax.block_until_ready(state0)


def consume(tree):
    return sum(jnp.sum(jnp.asarray(x, jnp.float32) * 1e-9)
               for x in jax.tree.leaves(tree))


def bench(name, fn):
    """fn(state, eps) -> pytree; chained over a drifting eps."""
    f = jax.jit(lambda st, c: consume(fn(st, c)) + c + 1e-4)
    float(np.asarray(f(state0, jnp.float32(0.0))))
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(N):
        c = f(state0, c)
    float(np.asarray(c))
    print(f"{name:32s} {(time.perf_counter() - t0) / N * 1000:8.2f} ms",
          flush=True)


def drift(st, c):
    return st._replace(mp_pos=st.mp_pos + c * 1e-9)


kf_id = int(state0.next_kf) - 1  # pretend last kf is fresh


def w_insert(st, c):
    st = drift(st, c)
    s2, _ = ops.insert_keyframe(st, frame, ts0.T, cur_pids)
    return s2


def w_tri(st, c):
    return mapping.triangulate_new_points(drift(st, c), kf_id, cfg)


def w_fuse(st, c):
    return mapping.fuse_neighbors(drift(st, c), kf_id, cfg)


def w_ba(n):
    def f(st, c):
        return ba_local.local_ba(drift(st, c), kf_id, cfg, n_outer=n,
                                 n_cg=25)
    return f


def w_cullp(st, c):
    return mapping.cull_points(drift(st, c), kf_id, cfg)


def w_cullkf(st, c):
    s2, t2 = mapping.cull_redundant_keyframes(drift(st, c), ts0, kf_id, cfg)
    return (s2, t2)


def w_bow(st, c):
    st = drift(st, c)
    bow, _, _ = slam._transform(frame.desc, frame.valid)
    return st.kf_bow.at[kf_id].set(bow)


bench("insert_keyframe", w_insert)
bench("triangulate_new_points", w_tri)
bench("fuse_neighbors", w_fuse)
bench("local_ba n_outer=1", w_ba(1))
bench("local_ba n_outer=5", w_ba(5))
bench("local_ba n_outer=15", w_ba(15))
bench("cull_points", w_cullp)
bench("cull_redundant_keyframes", w_cullkf)
bench("bow transform+set", w_bow)

"""Chained profile of track-step sub-stages on the TPU (r5 methodology:
consume all outputs, drifting dependent input, np.asarray warm fetch)."""

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
from orb_slam2_tpu.pipeline import tracking
from orb_slam2_tpu.core import camera, lie
from orb_slam2_tpu.solvers import pose_opt

N = int(os.environ.get("N", "10"))
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
jax.block_until_ready(frame)
state0, ts0 = slam.state, slam.ts


def consume(tree):
    return sum(jnp.sum(jnp.asarray(x, jnp.float32) * 1e-9)
               for x in jax.tree.leaves(tree))


def bench(name, fn):
    f = jax.jit(lambda st, c: consume(fn(st._replace(
        mp_pos=st.mp_pos + c * 1e-9), c)) + c + 1e-4)
    float(np.asarray(f(state0, jnp.float32(0.0))))
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(N):
        c = f(state0, c)
    float(np.asarray(c))
    print(f"{name:32s} {(time.perf_counter() - t0) / N * 1000:8.2f} ms",
          flush=True)


bench("full track_step",
      lambda st, c: slam._track_step.__wrapped__(st, ts0, frame,
                                                 jnp.asarray(False)))
bench("motion-model phase",
      lambda st, c: tracking.track_with_motion_model(st, ts0, frame, cfg))
bench("ref-kf phase",
      lambda st, c: tracking.track_reference_keyframe(st, ts0, frame, cfg))
bench("local-map phase",
      lambda st, c: tracking.track_local_map(
          st, ts0, frame, ts0.T, ts0.last_pids, cfg, jnp.asarray(False)))

# pose_opt alone with realistic inputs
K = camera.intrinsics(cfg.camera)
pids = ts0.last_pids
safe = jnp.clip(pids, 0, None)
pw = state0.mp_pos[safe]
valid = (pids >= 0) & ts0.last_valid


def po(st, c):
    inv_sigma2 = 1.0 / (cfg.orb.scale_factor ** 2) ** frame.octave.astype(jnp.float32)
    return pose_opt.pose_optimize(
        ts0.T, st.mp_pos[safe] + c * 1e-9, frame.uv, frame.ur, inv_sigma2,
        valid & frame.valid, frame.ur >= 0, K, jnp.float32(cfg.camera.bf),
        cfg.ba)


bench("pose_optimize (4x10)", po)

from orb_slam2_tpu.map.state import weighted_obs_count
bench("weighted_obs_count", lambda st, c: weighted_obs_count(st))
bench("record_traj", lambda st, c: tracking.record_traj(st, ts0, frame,
                                                        jnp.asarray(True)))

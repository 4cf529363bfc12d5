"""Diagnostic run: per-frame HUD + stage timing on the synthetic sequence."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam2_tpu import config
from orb_slam2_tpu.io import evaluate, synthetic
from orb_slam2_tpu.pipeline.system import SLAM

n_frames = int(os.environ.get("N_FRAMES", "120"))
cfg = config.SLAMConfig()
seq = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=500,
                         trajectory="xyz", seed=0)
slam = SLAM(cfg)

kf_t = []
tr_t = []
for f in range(n_frames):
    t0 = time.perf_counter()
    img = jax.numpy.asarray(seq.images[f], jax.numpy.float32)
    frame = slam._frame_fn(img, slam.frame_count, seq.timestamps[f])
    jax.block_until_ready(frame.uv)
    t1 = time.perf_counter()
    was_kf = False
    if slam.status == 1:  # NOT_INITIALIZED
        slam._initialize(frame)
    else:
        nkf0 = -1
        slam._track_frame(frame)
    jax.block_until_ready(slam.ts.T)
    t2 = time.perf_counter()
    slam.frame_count += 1
    hud = slam.last_hud
    print(f"f={f:3d} status={slam.status} inl={hud[1]:4d} needkf={hud[2]} "
          f"nkf={hud[3]:3d} nmp={hud[4]:5d} frame_ms={(t1-t0)*1e3:6.1f} "
          f"track_ms={(t2-t1)*1e3:6.1f}")
    tr_t.append(t2 - t1)

est = slam.poses_twc()
est_t = slam.timestamps()
ie, ig = evaluate.match_timestamps(est_t, seq.timestamps)
ate = evaluate.ate_rmse(est[ie], seq.poses_twc[ig], align_scale=True) if len(ie) >= 10 else float("nan")
print(f"tracked {len(ie)}/{n_frames} ATE {ate*100:.2f} cm")

"""Stage-level diagnostics for the keyframe step on the synthetic sequence."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam2_tpu import config
from orb_slam2_tpu.io import evaluate, synthetic
from orb_slam2_tpu.pipeline.system import SLAM
from orb_slam2_tpu.pipeline import mapping
from orb_slam2_tpu.map import ops
from orb_slam2_tpu.ba import local as ba_local

n_frames = int(os.environ.get("N_FRAMES", "40"))
gap = int(os.environ.get("KF_GAP", "3"))
cfg = config.SLAMConfig()
cfg = cfg.replace(tracking=config.dataclasses.replace(cfg.tracking, min_kf_gap=gap))
seq = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=500,
                         trajectory="xyz", seed=0)
slam = SLAM(cfg, enable_loop_closing=False)


def staged_keyframe_step(state, ts, frame, cur_pids):
    c = {}
    state, kf_id = ops.insert_keyframe(state, frame, ts.T, cur_pids)
    c["after_insert"] = int(state.n_mp)
    state = mapping.triangulate_new_points(state, kf_id, cfg)
    c["after_tri"] = int(state.n_mp)
    state = mapping.fuse_neighbors(state, kf_id, cfg)
    c["after_fuse"] = int(state.n_mp)
    state = ba_local.local_ba(state, kf_id, cfg,
                              n_outer=cfg.ba.local_ba_iters1 + cfg.ba.local_ba_iters2,
                              n_cg=25)
    state = mapping.cull_points(state, kf_id, cfg)
    c["after_cull"] = int(state.n_mp)
    from orb_slam2_tpu.pipeline.tracking import record_traj
    T_new = state.kf_pose[kf_id]
    ts = ts._replace(T=T_new, last_T=T_new, ref_kf=kf_id,
                     last_kf_frame_id=frame.frame_id)
    ts = record_traj(state, ts, frame, jnp.asarray(True))
    return state, ts, c


for f in range(n_frames):
    img = jnp.asarray(seq.images[f], jnp.float32)
    frame = slam._frame_fn(img, slam.frame_count, seq.timestamps[f])
    nkp = int(jnp.sum(frame.valid))
    if slam.status == 1:
        slam._initialize(frame)
        print(f"f={f:3d} INIT status={slam.status} nkp={nkp} nmp={int(slam.state.n_mp)}")
    else:
        state, ts, cur_pids, hud = slam._track_step(slam.state, slam.ts, frame)
        hud = np.asarray(hud)
        slam.state, slam.ts = state, ts
        slam.status = int(hud[0])
        line = f"f={f:3d} status={slam.status} nkp={nkp} inl={hud[1]:4d} nkf={hud[3]:3d} nmp={hud[4]:5d}"
        if slam.status == 2 and hud[2]:
            slam.state, slam.ts, c = staged_keyframe_step(
                slam.state, slam.ts, frame, cur_pids)
            if slam._transform is not None:
                slam.state = slam._set_bow(slam.state, slam.ts.ref_kf,
                                           frame.desc, frame.valid)
            line += f"  KF: {c}"
        print(line, flush=True)
    slam.frame_count += 1

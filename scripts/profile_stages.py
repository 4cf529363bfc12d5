"""Time each pipeline stage in isolation on a realistic mid-sequence state.

Runs the real pipeline for WARM frames to build a map, then times (with
block_until_ready, averaged over REPS):
  - frame extraction
  - track_step (motion model + local map + pose opts)
  - each keyframe-step sub-stage: insert / triangulate / fuse / local BA /
    cull_points / cull_redundant_keyframes / bow
"""

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
from orb_slam2_tpu.ba import local as ba_local
from orb_slam2_tpu.io import synthetic
from orb_slam2_tpu.map import ops
from orb_slam2_tpu.pipeline import mapping
from orb_slam2_tpu.pipeline.system import SLAM

WARM = int(os.environ.get("WARM", "40"))
REPS = int(os.environ.get("REPS", "5"))


def bench_fn(name, fn, *args):
    out = fn(*args)          # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:28s} {dt:9.1f} ms")
    return out


def main():
    cfg = config.SLAMConfig()
    seq = synthetic.generate(cfg.camera, n_frames=WARM + 2, n_points=500,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)
    for f in range(WARM):
        slam.track_mono(seq.images[f], seq.timestamps[f])
    slam.flush()
    print(f"warm state: {int(slam.state.n_kf)} KFs {int(slam.state.n_mp)} MPs "
          f"status {slam.status}")

    img = jnp.asarray(seq.images[WARM], jnp.float32)
    frame = slam._frame_fn(img, slam.frame_count, seq.timestamps[WARM])
    jax.block_until_ready(frame)
    state, ts = slam.state, slam.ts

    bench_fn("frame_fn (extract)", slam._frame_fn, img, slam.frame_count,
             seq.timestamps[WARM])
    out = bench_fn("track_step", slam._track_step, state, ts, frame)
    _, ts2, cur_pids, hud = out
    print("   hud:", np.asarray(hud))

    kf_id0 = state.next_kf  # do not mutate slam.state; all calls pure

    f_ins = jax.jit(lambda st: ops.insert_keyframe(st, frame, ts2.T, cur_pids))
    st1, kf_id = bench_fn("insert_keyframe", f_ins, state)

    f_tri = jax.jit(lambda st: mapping.triangulate_new_points(st, kf_id, cfg))
    st2 = bench_fn("triangulate_new_points", f_tri, st1)

    f_fuse = jax.jit(lambda st: mapping.fuse_neighbors(st, kf_id, cfg))
    st3 = bench_fn("fuse_neighbors", f_fuse, st2)

    n_outer = cfg.ba.local_ba_iters1 + cfg.ba.local_ba_iters2
    f_ba = jax.jit(lambda st: ba_local.local_ba(st, kf_id, cfg,
                                                n_outer=n_outer, n_cg=25))
    st4 = bench_fn("local_ba (15x25cg)", f_ba, st3)

    f_ba1 = jax.jit(lambda st: ba_local.local_ba(st, kf_id, cfg,
                                                 n_outer=5, n_cg=10))
    bench_fn("local_ba (5x10cg)", f_ba1, st3)

    f_cp = jax.jit(lambda st: mapping.cull_points(st, kf_id, cfg))
    st5 = bench_fn("cull_points", f_cp, st4)

    f_ck = jax.jit(lambda st: mapping.cull_redundant_keyframes(
        st, ts2, kf_id, cfg))
    bench_fn("cull_redundant_kfs", f_ck, st5)

    if slam._transform is not None:
        f_bow = jax.jit(lambda st: slam._set_bow(st, kf_id, frame.desc,
                                                 frame.valid))
        bench_fn("set_bow", f_bow, st5)

    f_full = slam._full_step
    bench_fn("full_step (no kf path)", f_full, state, ts,
             (img,), slam.frame_count, seq.timestamps[WARM],
             jnp.asarray(True))


if __name__ == "__main__":
    main()

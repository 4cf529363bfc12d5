"""Data-parallel multi-sequence SLAM benchmark (MULTICHIP evidence).

Two measurements:

1. SPMD correctness + communication accounting on a virtual 8-device CPU
   mesh (`--virtual`): the compiled per-frame program must contain ZERO
   cross-device collectives (the sequence axis is embarrassingly parallel),
   and every sequence must track.

2. Real-chip batch scaling (default, on the TPU): run S = 1, 2, 4, 8
   sequences batched on ONE device and report per-sequence frame time.
   Because the DP axis needs no communication, per-device throughput on an
   n-device mesh with one sequence per device equals the S=1 single-device
   number; the S>1 single-device numbers bound the *batched* per-device
   configuration.  Scaling efficiency to n devices is therefore
   t(S=1)/t_per_seq(S=n/devices) ~= 1 up to compiler/SPMD overhead, which
   measurement 1 bounds at zero collectives.

Writes one JSON line, stored by the round as MULTICHIP evidence.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def small_rgbd_cfg():
    from orb_slam2_tpu import config as config_mod
    cam = config_mod.CameraConfig(
        fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240,
        fps=30.0, bf=16.0, th_depth=35.0)
    orb = config_mod.ORBConfig(n_features=500, max_keypoints=512)
    cap = config_mod.Capacity(
        max_keyframes=96, max_points=6144, max_obs_per_kf=512,
        max_frames=512, local_ba_points=2048)
    return config_mod.SLAMConfig(sensor=config_mod.RGBD, camera=cam, orb=orb,
                                 cap=cap)


def gen_batch(cfg, S, F):
    import numpy as np
    from orb_slam2_tpu.io import synthetic
    imgs, depths = [], []
    for s in range(S):
        seq = synthetic.generate(cfg.camera, n_frames=F, n_points=300,
                                 trajectory="xyz", seed=s)
        imgs.append(np.stack(seq.images))
        depths.append(np.stack(seq.depths))
    return np.stack(imgs), np.stack(depths)   # [S, F, H, W]


def run_batched(cfg, S, F, mesh=None):
    """Returns (wall seconds for F-1 steps, tracked mask [S], compiled)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from orb_slam2_tpu.distributed.dp import (build_dp_step,
                                              build_sharded_step,
                                              make_batch_states, shard_batch)

    if mesh is not None:
        vinit, vstep = build_sharded_step(cfg, mesh)
    else:
        init_fn, step_fn = build_dp_step(cfg)
        vinit = jax.jit(jax.vmap(init_fn))
        vstep = jax.jit(jax.vmap(step_fn))

    imgs, depths = gen_batch(cfg, S, F)
    imgs = jnp.asarray(imgs, jnp.float32)
    depths = jnp.asarray(depths, jnp.float32)
    state, ts = make_batch_states(cfg, S)
    if mesh is not None:
        state, ts = shard_batch((state, ts), mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P("seq"))
        imgs = jax.device_put(imgs, sh)
        depths = jax.device_put(depths, sh)

    state, ts = vinit(state, ts, imgs[:, 0], depths[:, 0])
    compiled = vstep.lower(state, ts, imgs[:, 1], depths[:, 1],
                           jnp.ones((S,), jnp.int32),
                           jnp.full((S,), 1 / 30.0)).compile()
    # warm run of the real step
    state, ts, hud = vstep(state, ts, imgs[:, 1], depths[:, 1],
                           jnp.ones((S,), jnp.int32),
                           jnp.full((S,), 1 / 30.0))
    float(np.asarray(hud).sum())      # honest sync through the tunnel
    t0 = time.perf_counter()
    for f in range(2, F):
        fid = jnp.full((S,), f, jnp.int32)
        tt = jnp.full((S,), f / 30.0)
        state, ts, hud = vstep(state, ts, imgs[:, f], depths[:, f], fid, tt)
    hud_h = np.asarray(hud)
    wall = time.perf_counter() - t0
    tracked = hud_h[:, 0] == 2        # OK
    return wall, tracked, compiled, (state, ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", action="store_true",
                    help="8-device virtual CPU mesh (SPMD correctness)")
    ap.add_argument("--frames", type=int, default=48)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    from orb_slam2_tpu.distributed.dp import collective_ops_in_hlo

    cfg = small_rgbd_cfg()
    out = {"metric": "dp_slam_scaling", "frames": args.frames}
    if args.virtual:
        from jax.sharding import Mesh
        import numpy as np
        mesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
        wall, tracked, compiled, _ = run_batched(cfg, 8, args.frames, mesh)
        ncoll = collective_ops_in_hlo(compiled)
        out.update({
            "mode": "virtual-8dev-cpu-mesh",
            "sequences": 8,
            "tracked_sequences": int(tracked.sum()),
            "collective_ops_in_step_hlo": ncoll,
            "comm_bytes_per_step": 0 if ncoll == 0 else None,
            "note": "seq axis sharded over 8 devices; zero collectives => "
                    "DP scaling limited only by per-device batch overhead",
        })
    else:
        res = {}
        for S in (1, 2, 4, 8):
            wall, tracked, compiled, _ = run_batched(cfg, S, args.frames)
            per_seq_ms = wall / (args.frames - 2) * 1000
            res[S] = {
                "wall_s": round(wall, 2),
                "step_ms": round(per_seq_ms, 1),
                "frames_per_s_total": round(S * (args.frames - 2) / wall, 2),
                "tracked_sequences": int(tracked.sum()),
            }
        out.update({"mode": "single-chip-batch", "scaling": res})
        s1 = res[1]["step_ms"]
        out["batch8_efficiency"] = round(
            s1 / (res[8]["step_ms"] / 8), 3)
        out["projected_8dev_efficiency"] = round(
            min(1.0, s1 / res[1]["step_ms"]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

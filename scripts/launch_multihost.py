"""Two-process multi-host simulation launcher (VERDICT r3 item 7).

Spawns N worker processes on this machine, each exposing
`--devices-per-proc` virtual CPU devices, wires them into one JAX
distributed runtime via `distributed/runtime.py`, and runs one
landmark-sharded distributed BA solve over the GLOBAL mesh (devices of all
processes).  Process 0 prints the converged cost and a cross-process
checksum so divergence would be visible.

    python scripts/launch_multihost.py --nprocs 2 --devices-per-proc 4

On a real pod slice the same worker code runs unmodified: drop the
JAX_PLATFORMS/XLA_FLAGS overrides and `jax.distributed.initialize()`
autodetects the slice topology.
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def worker(rank: int, nprocs: int, port: int):
    os.environ["SLAM_NUM_PROCS"] = str(nprocs)
    os.environ["SLAM_PROC_ID"] = str(rank)
    os.environ["SLAM_COORDINATOR"] = f"127.0.0.1:{port}"

    from orb_slam2_tpu.distributed.runtime import (global_pt_mesh,
                                                   init_multihost)
    init_multihost()

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nprocs, jax.process_count()
    n_global = len(jax.devices())
    print(f"[rank {rank}] {jax.process_count()} procs, "
          f"{jax.local_device_count()} local / {n_global} global devices",
          flush=True)

    from orb_slam2_tpu.ba.schur import BAProblem
    from orb_slam2_tpu.core import camera as cam_mod, lie
    from orb_slam2_tpu.distributed.ba import distributed_ba_solve_sharded

    # deterministic synthetic problem, identical on every process
    rng = np.random.RandomState(0)
    C, P = 8, 1024
    K = jnp.asarray([200.0, 200.0, 64.0, 48.0])
    pts = jnp.asarray(rng.randn(P, 3) * [1, 1, 0.3] + [0, 0, 4], jnp.float32)
    cams, rows_uv, rows_cam = [], [], []
    for c in range(C):
        T = lie.se3_from_Rt(jnp.eye(3), jnp.asarray([-0.15 * c, 0.0, 0.0]))
        cams.append(T)
        uv = cam_mod.project(K, lie.se3_apply(T, pts))
        rows_uv.append(uv + jnp.asarray(rng.randn(P, 2) * 0.3, jnp.float32))
        rows_cam.append(jnp.full((P,), c, jnp.int32))
    # point-major: row p*C + c
    obs_uv = jnp.stack(rows_uv, axis=1).reshape(-1, 2)        # [P*C, 2]
    obs_cam = jnp.stack(rows_cam, axis=1).reshape(-1)
    obs_pid = jnp.repeat(jnp.arange(P, dtype=jnp.int32), C)
    prob = BAProblem(
        cam_pose=jnp.stack(cams),
        cam_var=jnp.asarray([False] + [True] * (C - 1)),
        points=pts + jnp.asarray(rng.randn(P, 3) * 0.02, jnp.float32),
        pt_var=jnp.ones((P,), bool),
        obs_cam=obs_cam, obs_pid=obs_pid, obs_uv=obs_uv,
        obs_ur=jnp.full((P * C,), -1.0), obs_w=jnp.ones((P * C,)),
        K=K, bf=jnp.asarray(0.0))

    mesh = global_pt_mesh()
    res = distributed_ba_solve_sharded(prob, mesh, D=C, n_outer=4, n_cg=10)
    # cam_pose is replicated -> addressable on every process
    cam = np.asarray(jax.device_get(
        jax.jit(lambda r: r.cam_pose, out_shardings=None)(res)))
    checksum = float(np.sum(cam))
    print(f"[rank {rank}] distributed BA over {n_global} devices on "
          f"{nprocs} processes OK, cam checksum {checksum:.6f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--port", type=int, default=9911)
    ap.add_argument("--rank", type=int, default=-1, help="(internal)")
    args = ap.parse_args()

    if args.rank >= 0:
        worker(args.rank, args.nprocs, args.port)
        return

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count="
                        f"{args.devices_per_proc}").strip()
    env.pop("PYTHONSTARTUP", None)
    # CPU-only workers: disable the TPU-tunnel plugin (its sitecustomize
    # would initialize the XLA backend before jax.distributed.initialize)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon_site" not in p]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(pp + [repo_root])
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--rank", str(r), "--nprocs", str(args.nprocs),
         "--port", str(args.port),
         "--devices-per-proc", str(args.devices_per_proc)], env=env)
        for r in range(args.nprocs)]
    rc = [p.wait() for p in procs]
    if any(rc):
        sys.exit(f"worker exit codes: {rc}")
    print("multihost simulation OK")


if __name__ == "__main__":
    main()

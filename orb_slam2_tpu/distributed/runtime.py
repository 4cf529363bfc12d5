"""Multi-host runtime entry: `jax.distributed` wiring.

The reference is strictly single-process (SURVEY.md §2.5 — std::thread and
mutexes, no communication backend).  This module provides the pod-slice
story: each host process calls `init_multihost()` once at startup, after
which `jax.devices()` spans the whole slice and the SPMD solvers in
`distributed/ba.py` / `distributed/posegraph.py` shard over a global mesh
with XLA collectives riding ICI (TPU) or gloo (CPU simulation).

Simulation without hardware (2 processes x 4 virtual CPU devices = one
8-device global mesh):

    python scripts/launch_multihost.py --nprocs 2 --devices-per-proc 4

Environment contract (set by the launcher, or by your scheduler on a real
slice — on Cloud TPU `jax.distributed.initialize()` autodetects all of it):

    SLAM_COORDINATOR  host:port of process 0   (default 127.0.0.1:9911)
    SLAM_NUM_PROCS    total process count
    SLAM_PROC_ID      this process's rank
"""

from __future__ import annotations

import os


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize the JAX distributed runtime from args or the SLAM_* env
    vars.  No-op when SLAM_NUM_PROCS is absent/1 and no args are given
    (single-host operation stays zero-config)."""
    import jax

    num_processes = num_processes if num_processes is not None else \
        int(os.environ.get("SLAM_NUM_PROCS", "1"))
    if num_processes <= 1:
        return
    coordinator = coordinator or os.environ.get("SLAM_COORDINATOR",
                                                "127.0.0.1:9911")
    process_id = process_id if process_id is not None else \
        int(os.environ.get("SLAM_PROC_ID", "0"))
    # decide from env, NOT jax.default_backend() — that would initialize the
    # XLA backend and make jax.distributed.initialize() fail
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # cross-process CPU collectives need the gloo implementation
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_pt_mesh():
    """Mesh over every device of every process, axis `pt` — pass to
    `distributed_ba_solve_sharded` for slice-wide map-block BA."""
    import jax
    return jax.make_mesh((len(jax.devices()),), ("pt",))

"""Distributed SPMD solvers + multi-host runtime.

Lazy exports: `runtime.init_multihost` must be importable WITHOUT touching
any module that builds jnp arrays at import time (doing so initializes the
XLA backend, after which `jax.distributed.initialize()` refuses to run).
"""

_EXPORTS = {
    "distributed_ba_solve": "orb_slam2_tpu.distributed.ba",
    "distributed_ba_solve_sharded": "orb_slam2_tpu.distributed.ba",
    "make_obs_mesh": "orb_slam2_tpu.distributed.ba",
    "make_pt_mesh": "orb_slam2_tpu.distributed.ba",
    "distributed_pose_graph": "orb_slam2_tpu.distributed.posegraph",
    "make_edge_mesh": "orb_slam2_tpu.distributed.posegraph",
    "init_multihost": "orb_slam2_tpu.distributed.runtime",
    "global_pt_mesh": "orb_slam2_tpu.distributed.runtime",
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(name)

"""orb_slam2_tpu — a TPU-native visual SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ORB-SLAM2
(monocular / stereo / RGB-D tracking, sparse mapping, place recognition,
relocalization, loop closing, motion-only/local/global bundle adjustment and
Sim3 pose-graph optimization).

Architecture: instead of the reference's four C++ threads mutating a shared
pointer graph under ~20 mutexes (reference System.cc:84-103), the map is a
pytree of fixed-capacity structure-of-arrays and the tracking / local-mapping /
loop-closing stages are pure jitted functions `state' = step(state, frame)`
run on a deterministic schedule.  Descriptor matching is formulated as
bfloat16 matmuls on the MXU; bundle adjustment is a batched Levenberg-
Marquardt solver with Schur-complement landmark marginalization, shardable
over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"


def _setup_compile_cache():
    """Enable the persistent XLA compilation cache.

    The container's sitecustomize imports jax before any user code, so the
    JAX_COMPILATION_CACHE_DIR env var alone is read too late — it must be
    applied through jax.config after import.  Without this every process
    recompiles the multi-second track/keyframe/BA programs from scratch."""
    import os

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # old jax without these options


_setup_compile_cache()

from orb_slam2_tpu import config as config

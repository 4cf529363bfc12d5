"""Data-parallel multi-sequence SLAM: S independent sequences, one map per
mesh slot, stepped in lock-step by ONE SPMD program.

This is the BASELINE.md "KITTI 00-10 batch" configuration: the reference
processes sequences one at a time on one CPU; here the whole per-frame
pipeline (extraction -> tracking -> staged keyframe integration) is vmapped
over a leading sequence axis and sharded over the `seq` mesh axis.  The axis
is embarrassingly parallel — each sequence owns its map — so the compiled
program contains ZERO cross-device collectives (asserted by
`collective_ops_in_hlo`); scaling efficiency on real hardware is bounded
only by per-device batch overhead, which `scripts/dp_slam_bench.py` measures
on the chip by scaling S on one device.

Distributed *solvers* (landmark-sharded Schur BA, sharded pose graph) cover
the model-parallel axes; see distributed/ba.py and distributed/posegraph.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import RGBD, SLAMConfig
from orb_slam2_tpu.ba import local as ba_local
from orb_slam2_tpu.map import empty_map, ops
from orb_slam2_tpu.pipeline import frame as frame_mod
from orb_slam2_tpu.pipeline import init as init_mod
from orb_slam2_tpu.pipeline import mapping, tracking

BA_CHUNKS = 3
BA_ITERS = 5
N_STAGES = 2 + BA_CHUNKS + 1


def build_dp_step(cfg: SLAMConfig):
    """Returns (init_fn, step_fn), both vmappable over a leading S axis.

    init_fn(state, ts, img, depth)          -> (state, ts)
    step_fn(state, ts, img, depth, fid, t)  -> (state, ts, hud)

    The step is the same per-frame program as pipeline/system.py's fused
    full_step (tracking + deterministic staged LocalMapping), minus the
    host-driven rare events (loop closing, relocalization) which are not on
    the throughput path.
    """
    assert cfg.sensor == RGBD, "the DP driver batches RGB-D sequences"
    frame_fn = frame_mod.build_rgbd_frame_fn(cfg)
    track = tracking.build_track_step(cfg)

    def insert_kf(state, ts, frame, cur_pids):
        state, kf_id = ops.insert_keyframe(state, frame, ts.T, cur_pids)
        state = mapping.create_depth_points(state, kf_id, cfg)
        ts = ts._replace(ref_kf=kf_id, last_kf_frame_id=frame.frame_id,
                         map_kf=kf_id, map_stage=jnp.asarray(0, jnp.int32),
                         ba_lam=jnp.asarray(1e-4, jnp.float32))
        ts = tracking.record_traj(state, ts, frame, jnp.asarray(True))
        return state, ts

    def mapping_stage(state, ts):
        k = jnp.clip(ts.map_kf, 0, None)

        def s_tri(op):
            st, t = op
            return mapping.triangulate_new_points(st, k, cfg), t

        def s_fuse(op):
            st, t = op
            return mapping.fuse_neighbors(st, k, cfg), t

        def s_ba(op):
            st, t = op
            st, lam = ba_local.local_ba(st, k, cfg, n_outer=BA_ITERS,
                                        lam0=t.ba_lam, return_lam=True)
            return st, t._replace(ba_lam=lam)

        def s_cull(op):
            st, t = op
            st = mapping.cull_points(st, k, cfg)
            st, t = mapping.cull_redundant_keyframes(st, t, k, cfg)
            return st, t

        branches = [s_tri, s_fuse] + [s_ba] * BA_CHUNKS + [s_cull]
        state, ts = jax.lax.switch(
            jnp.clip(ts.map_stage, 0, N_STAGES - 1), branches, (state, ts))
        stage = ts.map_stage + 1
        done = stage >= N_STAGES
        ts = ts._replace(map_stage=jnp.where(done, 0, stage),
                         map_kf=jnp.where(done, -1, ts.map_kf))
        return state, ts

    def init_fn(state, ts, img, depth):
        frame = frame_fn(img, depth, jnp.asarray(0, jnp.int32),
                         jnp.asarray(0.0, jnp.float32))

        def do(op):
            st, t = op
            st, t, _ = init_mod.stereo_initialize(st, t, frame, cfg)
            t = tracking.record_traj(st, t, frame, jnp.asarray(True))
            return st, t

        enough = frame.n >= cfg.tracking.stereo_init_min_kps
        return jax.lax.cond(enough, do, lambda op: op, (state, ts))

    def step_fn(state, ts, img, depth, fid, t):
        frame = frame_fn(img, depth, fid, t)
        state, ts, cur_pids, hud = track(state, ts, frame)
        busy_early = (ts.map_kf >= 0) & (ts.map_stage <= 1)
        need = (hud[tracking.HUD_NEED_KF] > 0) & jnp.logical_not(busy_early)
        state, ts = jax.lax.cond(
            need, lambda op: insert_kf(op[0], op[1], frame, cur_pids),
            lambda op: op, (state, ts))
        state, ts = jax.lax.cond(
            ts.map_kf >= 0, lambda op: mapping_stage(*op),
            lambda op: op, (state, ts))
        return state, ts, hud

    return init_fn, step_fn


def make_batch_states(cfg: SLAMConfig, S: int):
    """S stacked fresh (MapState, TrackState) pytrees."""
    st = empty_map(cfg)
    ts = tracking.empty_track_state(cfg)
    tile = lambda x: jnp.broadcast_to(x[None], (S,) + x.shape)
    return (jax.tree.map(tile, st), jax.tree.map(tile, ts))


def shard_batch(tree, mesh, axis: str = "seq"):
    """Shard a stacked pytree's leading axis over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def build_sharded_step(cfg: SLAMConfig, mesh, axis: str = "seq"):
    """shard_map-wrapped (init, step): the sequence axis is partitioned
    MANUALLY, so the compiled program is structurally collective-free —
    jit with auto-sharding inserts resharding all-gathers around scatter/
    reshape patterns in the map ops (measured: 84 collectives), which
    shard_map forbids by construction."""
    import functools
    from jax.sharding import PartitionSpec
    P_ = PartitionSpec(axis)
    init_fn, step_fn = build_dp_step(cfg)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=P_, out_specs=P_, check_vma=False)
    def sinit(state, ts, img, depth):
        return jax.vmap(init_fn)(state, ts, img, depth)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=P_, out_specs=P_, check_vma=False)
    def sstep(state, ts, img, depth, fid, t):
        return jax.vmap(step_fn)(state, ts, img, depth, fid, t)

    return jax.jit(sinit), jax.jit(sstep)


def collective_ops_in_hlo(compiled) -> int:
    """Count cross-device collective instructions in a compiled program —
    the DP sequence axis must compile to ZERO (communication-bytes
    accounting for MULTICHIP evidence)."""
    txt = compiled.as_text()
    names = ("all-reduce", "all-gather", "reduce-scatter",
             "collective-permute", "all-to-all")
    return sum(txt.count(n) for n in names)

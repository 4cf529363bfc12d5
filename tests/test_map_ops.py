import dataclasses

import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu import config
from orb_slam2_tpu.core import lie
from orb_slam2_tpu.map import MapState, empty_map
from orb_slam2_tpu.map import ops, state as mstate
from orb_slam2_tpu.pipeline.frame import Frame


def tiny_cfg():
    return config.SLAMConfig(
        cap=config.Capacity(max_keyframes=8, max_points=64, max_obs_per_kf=16,
                            max_obs_per_point=4),
        orb=config.ORBConfig(n_features=16, max_keypoints=16, n_levels=2))


def mk_frame(seed=0, n=16, fid=0):
    rng = np.random.RandomState(seed)
    return Frame(
        uv=jnp.asarray(rng.rand(n, 2) * 100, jnp.float32),
        uv_raw=jnp.asarray(rng.rand(n, 2) * 100, jnp.float32),
        ur=jnp.full((n,), -1.0), depth=jnp.full((n,), -1.0),
        octave=jnp.zeros((n,), jnp.int32),
        angle=jnp.zeros((n,), jnp.float32),
        desc=jnp.asarray(rng.randint(0, 255, (n, 32)), jnp.uint8),
        valid=jnp.ones((n,), bool),
        frame_id=jnp.asarray(fid, jnp.int32),
        timestamp=jnp.asarray(0.1 * fid, jnp.float32))


def test_insert_keyframe_basic():
    cfg = tiny_cfg()
    st = empty_map(cfg)
    f = mk_frame()
    st, k = ops.insert_keyframe(st, f, lie.se3_identity(),
                                jnp.full((16,), -1, jnp.int32))
    assert int(k) == 0
    assert bool(st.kf_valid[0])
    assert int(st.next_kf) == 1
    assert int(st.n_kf) == 1
    np.testing.assert_array_equal(np.asarray(st.kf_obs[0]), -1)


def test_alloc_and_observe_two_kfs():
    cfg = tiny_cfg()
    st = empty_map(cfg)
    f0, f1 = mk_frame(0, fid=0), mk_frame(1, fid=1)
    st, k0 = ops.insert_keyframe(st, f0, lie.se3_identity(),
                                 jnp.full((16,), -1, jnp.int32))
    # create 8 points observed by kf0 at kps 0..7
    want = jnp.arange(16) < 8
    pos = jnp.asarray(np.random.RandomState(3).randn(16, 3), jnp.float32)
    st, pids = ops.alloc_points(st, want, pos, f0.desc, k0)
    assert int(st.n_mp) == 8
    np.testing.assert_array_equal(np.asarray(pids[:8]), np.arange(8))
    st = ops.add_obs(st, k0, jnp.arange(16), pids)
    # kf1 sees points 0..5 at kps 10..15
    obs1 = jnp.full((16,), -1, jnp.int32)
    obs1 = obs1.at[10:16].set(jnp.arange(6))
    st, k1 = ops.insert_keyframe(st, f1, lie.se3_identity(), obs1)
    # covisibility weight = 6 shared points
    assert int(st.covis[0, 1]) == 6
    assert int(st.covis[1, 0]) == 6
    # spanning parent of kf1 is kf0
    assert int(st.kf_parent[1]) == 0
    cnt = mstate.point_obs_count(st)
    np.testing.assert_array_equal(np.asarray(cnt[:8]), [2, 2, 2, 2, 2, 2, 1, 1])
    # mirror table consistent
    assert int((st.mp_obs_kf[0] >= 0).sum()) == 2


def test_remove_obs_both_sides():
    cfg = tiny_cfg()
    st = empty_map(cfg)
    f0 = mk_frame(0)
    st, k0 = ops.insert_keyframe(st, f0, lie.se3_identity(),
                                 jnp.full((16,), -1, jnp.int32))
    want = jnp.arange(16) < 4
    st, pids = ops.alloc_points(st, want, jnp.zeros((16, 3)), f0.desc, k0)
    st = ops.add_obs(st, k0, jnp.arange(16), pids)
    mask = jnp.zeros((16,), bool).at[1].set(True).at[3].set(True)
    st = ops.remove_obs(st, k0, mask)
    obs = np.asarray(st.kf_obs[0])
    assert obs[1] == -1 and obs[3] == -1
    assert obs[0] == 0 and obs[2] == 2
    cnt = np.asarray(mstate.point_obs_count(st))
    np.testing.assert_array_equal(cnt[:4], [1, 0, 1, 0])
    assert int((st.mp_obs_kf[1] >= 0).sum()) == 0


def test_cull_points():
    cfg = tiny_cfg()
    st = empty_map(cfg)
    f0 = mk_frame(0)
    st, k0 = ops.insert_keyframe(st, f0, lie.se3_identity(),
                                 jnp.full((16,), -1, jnp.int32))
    st, pids = ops.alloc_points(st, jnp.arange(16) < 4, jnp.zeros((16, 3)),
                                f0.desc, k0)
    st = ops.add_obs(st, k0, jnp.arange(16), pids)
    bad = jnp.zeros((64,), bool).at[0].set(True).at[2].set(True)
    st = ops.cull_points(st, bad)
    assert int(st.n_mp) == 2
    obs = np.asarray(st.kf_obs[0])
    assert obs[0] == -1 and obs[2] == -1 and obs[1] == 1 and obs[3] == 3


def test_replace_points():
    cfg = tiny_cfg()
    st = empty_map(cfg)
    f0 = mk_frame(0)
    st, k0 = ops.insert_keyframe(st, f0, lie.se3_identity(),
                                 jnp.full((16,), -1, jnp.int32))
    st, pids = ops.alloc_points(st, jnp.arange(16) < 4, jnp.zeros((16, 3)),
                                f0.desc, k0)
    st = ops.add_obs(st, k0, jnp.arange(16), pids)
    src = jnp.full((64,), -1, jnp.int32).at[0].set(0)  # replace point0 -> dst
    dst = jnp.full((64,), -1, jnp.int32).at[0].set(2)
    st = ops.replace_points(st, src, dst)
    obs = np.asarray(st.kf_obs[0])
    assert obs[0] == 2  # rewritten
    assert not bool(st.mp_valid[0])
    assert int(st.mp_replaced[0]) == 2
    assert int(mstate.resolve_replaced(st, jnp.asarray(0))) == 2


def test_update_point_attributes():
    cfg = tiny_cfg()
    st = empty_map(cfg)
    f0, f1 = mk_frame(0, fid=0), mk_frame(1, fid=1)
    T0 = lie.se3_identity()
    T1 = lie.se3_from_Rt(jnp.eye(3), jnp.asarray([-0.5, 0.0, 0.0]))
    st, k0 = ops.insert_keyframe(st, f0, T0, jnp.full((16,), -1, jnp.int32))
    pos = jnp.zeros((16, 3)).at[:, 2].set(3.0)  # points 3m ahead
    st, pids = ops.alloc_points(st, jnp.arange(16) < 4, pos, f0.desc, k0)
    st = ops.add_obs(st, k0, jnp.arange(16), pids)
    obs1 = jnp.full((16,), -1, jnp.int32).at[0:4].set(jnp.arange(4))
    st, k1 = ops.insert_keyframe(st, f1, T1, obs1)
    st = ops.update_point_attributes(st, jnp.arange(64) < 8, 1.2, 8)
    # normal points from cameras (z≈0) toward z=3 -> positive z
    nrm = np.asarray(st.mp_normal[:4])
    assert (nrm[:, 2] > 0.9).all()
    assert float(st.mp_max_dist[0]) > 0
    assert float(st.mp_min_dist[0]) < float(st.mp_max_dist[0])
    # descriptor comes from one of the two observations
    d0 = np.asarray(st.mp_desc[0])
    assert (d0 == np.asarray(f0.desc[0])).all() or (d0 == np.asarray(f1.desc[0])).all()


def test_covisible_neighbors():
    cfg = tiny_cfg()
    st = empty_map(cfg)
    for i in range(3):
        st, _ = ops.insert_keyframe(st, mk_frame(i, fid=i), lie.se3_identity(),
                                    jnp.full((16,), -1, jnp.int32))
    st = st._replace(covis=st.covis.at[0, 1].set(20).at[0, 2].set(5))
    nb = np.asarray(mstate.covisible_neighbors(st, jnp.asarray(0), 4))
    assert nb[0] == 1 and nb[1] == 2
    assert (nb[2:] == -1).all()

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.matching import hamming, search


def _rand_desc(rng, n):
    return jnp.asarray(rng.randint(0, 256, (n, 32)), dtype=jnp.uint8)


def test_hamming_matrix_exact():
    rng = np.random.RandomState(0)
    a = _rand_desc(rng, 64)
    b = _rand_desc(rng, 48)
    ours = np.asarray(hamming.hamming_matrix(a, b))
    an = np.unpackbits(np.asarray(a), axis=1)
    bn = np.unpackbits(np.asarray(b), axis=1)
    ref = (an[:, None, :] != bn[None, :, :]).sum(-1)
    np.testing.assert_array_equal(ours, ref)


def test_hamming_rows_exact():
    rng = np.random.RandomState(1)
    a = _rand_desc(rng, 32)
    b = _rand_desc(rng, 32)
    ours = np.asarray(hamming.hamming_rows(a, b))
    an = np.unpackbits(np.asarray(a), axis=1)
    bn = np.unpackbits(np.asarray(b), axis=1)
    np.testing.assert_array_equal(ours, (an != bn).sum(-1))


def test_match_identical_descriptors():
    rng = np.random.RandomState(2)
    d = _rand_desc(rng, 32)
    perm = rng.permutation(32)
    dist = hamming.hamming_matrix(d, d[perm])
    gate = jnp.ones((32, 32), bool)
    valid = jnp.ones((32,), bool)
    res = search.match_descriptors(dist, gate, max_dist=50, ratio=None,
                                   valid_a=valid, valid_b=valid)
    # row i should match the column holding descriptor i
    inv = np.argsort(perm)
    np.testing.assert_array_equal(np.asarray(res.idx), inv)


def test_ratio_test_rejects_ambiguous():
    # two identical columns -> best == second -> ratio test kills the match
    d = _rand_desc(np.random.RandomState(3), 4)
    b = jnp.concatenate([d, d], axis=0)  # every descriptor duplicated
    dist = hamming.hamming_matrix(d, b)
    gate = jnp.ones((4, 8), bool)
    res = search.match_descriptors(dist, gate, max_dist=50, ratio=0.9,
                                   valid_a=jnp.ones(4, bool), valid_b=jnp.ones(8, bool))
    assert int(res.n) == 0


def test_resolve_duplicates():
    idx = jnp.asarray([2, 2, 1, -1])
    dist = jnp.asarray([10, 5, 3, 0])
    out = np.asarray(search.resolve_duplicates(idx, dist, 8))
    np.testing.assert_array_equal(out, [-1, 2, 1, -1])


def test_window_gate_scalar_and_vector():
    a = jnp.asarray([[0.0, 0.0], [10.0, 10.0]])
    b = jnp.asarray([[1.0, 1.0], [20.0, 20.0]])
    g = np.asarray(search.window_gate(a, b, 2.0))
    np.testing.assert_array_equal(g, [[True, False], [False, False]])
    g2 = np.asarray(search.window_gate(a, b, jnp.asarray([2.0, 15.0])))
    np.testing.assert_array_equal(g2, [[True, False], [True, True]])


def test_rotation_consistency():
    # 20 matches rotated by ~10deg, 3 outliers at scattered angles
    n = 23
    rng = np.random.RandomState(4)
    angle_a = jnp.asarray(rng.rand(n) * 2 * np.pi)
    angle_b = angle_a - np.deg2rad(10.0)
    angle_b = angle_b.at[20].add(1.0).at[21].add(2.0).at[22].add(-2.2)
    idx = jnp.arange(n)
    out = np.asarray(search.rotation_consistency(angle_a, angle_b, idx))
    assert (out[:20] == np.arange(20)).all()
    assert (out[20:] == -1).sum() >= 2  # most outliers rejected


def test_search_by_projection_scale_window():
    rng = np.random.RandomState(5)
    n_pt, n_kp = 16, 32
    desc = _rand_desc(rng, n_pt)
    kp_desc = jnp.concatenate([desc, _rand_desc(rng, n_kp - n_pt)], axis=0)
    pred_uv = jnp.asarray(rng.rand(n_pt, 2) * 100, jnp.float32)
    kp_uv = jnp.concatenate([pred_uv + 1.0,
                             jnp.asarray(rng.rand(n_kp - n_pt, 2) * 100 + 200)], 0)
    res = search.search_by_projection(
        pred_uv, jnp.zeros(n_pt, jnp.int32), desc, jnp.ones(n_pt, bool),
        kp_uv, jnp.zeros(n_kp, jnp.int32), kp_desc, jnp.zeros(n_kp),
        jnp.ones(n_kp, bool), radius_per_pt=4.0, max_dist=30, ratio=None)
    np.testing.assert_array_equal(np.asarray(res.idx), np.arange(n_pt))

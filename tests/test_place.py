import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.place import database, vocab as vocab_mod


def _descs(rng, n):
    return rng.randint(0, 256, (n, 32)).astype(np.uint8)


def _perturb(rng, d, nbits):
    """Flip nbits random bits in each descriptor."""
    bits = np.unpackbits(d, axis=1)
    for i in range(len(bits)):
        idx = rng.choice(256, nbits, replace=False)
        bits[i, idx] ^= 1
    return np.packbits(bits, axis=1)


def test_train_and_transform():
    rng = np.random.RandomState(0)
    train = _descs(rng, 2000)
    v = vocab_mod.train_vocabulary(train, k=5, depth=3, seed=0)
    assert v.n_words > 50
    tf = jax.jit(vocab_mod.build_transform(v))
    d = jnp.asarray(train[:64])
    bow, word, node_lu = tf(d, jnp.ones(64, bool))
    assert float(jnp.sum(bow)) > 0.99  # L1 normalized
    assert int(jnp.sum(word >= 0)) == 64
    # same descriptors -> same words
    bow2, word2, _ = tf(d, jnp.ones(64, bool))
    np.testing.assert_array_equal(np.asarray(word), np.asarray(word2))


def test_similar_images_score_higher():
    rng = np.random.RandomState(1)
    train = _descs(rng, 4000)
    # realistic vocab size (8^4 = 4096 words) so word hits are sparse
    v = vocab_mod.train_vocabulary(train, k=8, depth=4, seed=0)
    tf = jax.jit(vocab_mod.build_transform(v))
    img_a = _descs(rng, 200)
    img_a2 = _perturb(rng, img_a, 8)     # slightly perturbed view of A
    img_b = _descs(rng, 200)
    ones = jnp.ones(200, bool)
    bow_a, _, _ = tf(jnp.asarray(img_a), ones)
    bow_a2, _, _ = tf(jnp.asarray(img_a2), ones)
    bow_b, _, _ = tf(jnp.asarray(img_b), ones)
    s_same = float(vocab_mod.l1_score(bow_a, bow_a2))
    s_diff = float(vocab_mod.l1_score(bow_a, bow_b))
    assert s_same > 1.5 * s_diff, (s_same, s_diff)


def test_loop_candidates_find_revisit():
    rng = np.random.RandomState(2)
    train = _descs(rng, 3000)
    v = vocab_mod.train_vocabulary(train, k=6, depth=3, seed=0)
    tf = jax.jit(vocab_mod.build_transform(v))
    ones = jnp.ones(150, bool)
    K = 16
    W = v.n_words
    kf_bow = np.zeros((K, W), np.float32)
    scenes = [_descs(rng, 150) for _ in range(8)]
    # kfs 0..7 distinct scenes; kf 8 revisits scene 2
    for i in range(8):
        kf_bow[i] = np.asarray(tf(jnp.asarray(scenes[i]), ones)[0])
    query_desc = _perturb(rng, scenes[2], 6)
    qbow = tf(jnp.asarray(query_desc), ones)[0]
    kf_valid = jnp.asarray([True] * 8 + [False] * 8)
    covis = jnp.zeros((K, K), jnp.int32)
    res = database.detect_loop_candidates(
        jnp.asarray(kf_bow), kf_valid, covis, jnp.asarray(8),
        qbow, jnp.asarray(0.01))
    ids = np.asarray(res.ids)
    assert ids[0] == 2, f"expected kf2 as top loop candidate, got {ids}"


def test_loop_candidates_exclude_connected():
    rng = np.random.RandomState(3)
    train = _descs(rng, 2000)
    v = vocab_mod.train_vocabulary(train, k=5, depth=3, seed=0)
    tf = jax.jit(vocab_mod.build_transform(v))
    ones = jnp.ones(100, bool)
    K = 8
    kf_bow = np.zeros((K, v.n_words), np.float32)
    scene = _descs(rng, 100)
    for i in range(4):
        kf_bow[i] = np.asarray(tf(jnp.asarray(_perturb(rng, scene, 4)), ones)[0])
    qbow = tf(jnp.asarray(scene), ones)[0]
    covis = jnp.zeros((K, K), jnp.int32).at[4, 0].set(50).at[4, 1].set(50)
    kf_valid = jnp.asarray([True] * 4 + [True] + [False] * 3)
    res = database.detect_reloc_candidates(
        jnp.asarray(kf_bow), kf_valid, covis, qbow)
    assert np.asarray(res.ids)[0] in (0, 1, 2, 3)
    res2 = database.detect_loop_candidates(
        jnp.asarray(kf_bow), kf_valid, covis, jnp.asarray(4), qbow,
        jnp.asarray(0.0))
    # kfs 0 and 1 are connected to the query -> excluded
    assert 0 not in np.asarray(res2.ids)[:2]
    assert 1 not in np.asarray(res2.ids)[:2]


def test_orbvoc_text_roundtrip(tmp_path):
    """save_orbvoc_text -> load_orbvoc_text preserves tree + transform."""
    import numpy as np
    from orb_slam2_tpu.place.vocab import (build_transform, load_orbvoc_text,
                                           save_orbvoc_text,
                                           train_vocabulary)
    rng = np.random.RandomState(3)
    desc = rng.randint(0, 256, (400, 32)).astype(np.uint8)
    v = train_vocabulary(desc, k=3, depth=3, seed=0, levels_up=1)
    p = str(tmp_path / "voc.txt")
    save_orbvoc_text(v, p)
    v2 = load_orbvoc_text(p, levels_up=1)
    assert v2.k == v.k and v2.depth == v.depth
    assert v2.n_words == v.n_words
    import jax.numpy as jnp
    t1 = build_transform(v)
    t2 = build_transform(v2)
    d = jnp.asarray(desc[:50])
    ok = jnp.ones((50,), bool)
    b1, w1, _ = t1(d, ok)
    b2, w2, _ = t2(d, ok)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)


def test_orbvoc_truncate(tmp_path):
    import numpy as np
    from orb_slam2_tpu.place.vocab import (build_transform, load_orbvoc_text,
                                           save_orbvoc_text,
                                           train_vocabulary)
    rng = np.random.RandomState(4)
    desc = rng.randint(0, 256, (600, 32)).astype(np.uint8)
    v = train_vocabulary(desc, k=3, depth=4, seed=0, levels_up=1)
    p = str(tmp_path / "voc.txt")
    save_orbvoc_text(v, p)
    vt = load_orbvoc_text(p, levels_up=1, truncate_depth=2)
    assert vt.depth == 2
    assert vt.n_words <= 3 ** 2
    import jax.numpy as jnp
    t = build_transform(vt)
    b, w, _ = t(jnp.asarray(desc[:20]), jnp.ones((20,), bool))
    assert float(jnp.sum(b)) > 0

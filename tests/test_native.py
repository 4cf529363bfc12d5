"""Native C++ components vs their Python fallbacks."""

import os

import numpy as np
import pytest

from orb_slam2_tpu.place import vocab as V


@pytest.fixture()
def small_voc():
    rng = np.random.RandomState(0)
    desc = rng.randint(0, 256, (2000, 32)).astype(np.uint8)
    return V.train_vocabulary(desc, k=4, depth=3, seed=0, levels_up=1)


def test_native_voc_parser_matches_python(tmp_path, small_voc):
    """The mmap tokenizer (native/voc_parser.cpp) must reproduce the Python
    parse of the DBoW2 text format bit for bit."""
    p = str(tmp_path / "voc.txt")
    V.save_orbvoc_text(small_voc, p)
    lib = V._native_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    v_nat = V.load_orbvoc_text(p, levels_up=1)
    saved = V._NATIVE_VOC
    try:
        V._NATIVE_VOC = None          # force the Python fallback
        v_py = V.load_orbvoc_text(p, levels_up=1)
    finally:
        V._NATIVE_VOC = saved
    np.testing.assert_array_equal(v_nat.node_desc, v_py.node_desc)
    np.testing.assert_array_equal(v_nat.node_children, v_py.node_children)
    np.testing.assert_array_equal(v_nat.word_id, v_py.word_id)
    np.testing.assert_allclose(v_nat.word_weight, v_py.word_weight,
                               rtol=1e-5)
    assert v_nat.k == v_py.k and v_nat.depth == v_py.depth


def test_orbvoc_roundtrip_transform(tmp_path, small_voc):
    """save -> load -> transform must produce identical BoW vectors."""
    import jax.numpy as jnp
    p = str(tmp_path / "voc.txt")
    V.save_orbvoc_text(small_voc, p)
    v2 = V.load_orbvoc_text(p, levels_up=1)
    rng = np.random.RandomState(1)
    desc = jnp.asarray(rng.randint(0, 256, (64, 32)), jnp.uint8)
    valid = jnp.ones((64,), bool)
    t1 = V.build_transform(small_voc)
    t2 = V.build_transform(v2)
    b1, _, _ = t1(desc, valid)
    b2, _, _ = t2(desc, valid)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-6)

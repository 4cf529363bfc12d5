"""Pallas kernels vs their jnp reference implementations.

On the CPU test mesh the kernels run in interpreter mode (bit-exact same
program); on a real TPU backend the same call compiles through Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.frontend import fast
from orb_slam2_tpu.frontend.pallas_fast import fast_nms_pallas


def _ref(img):
    return fast.nms3x3(fast.fast_score_map(img))


def test_fast_nms_pallas_matches_reference():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(96, 256).astype(np.float32) * 255)
    ref = np.asarray(_ref(img))
    out = np.asarray(fast_nms_pallas(img))
    # both zero the 3-px border; interior must agree exactly
    np.testing.assert_allclose(out[3:-3, 3:-3], ref[3:-3, 3:-3],
                               rtol=0, atol=1e-5)


def test_fast_nms_pallas_nonsquare_tile_remainder():
    rng = np.random.RandomState(1)
    # height not a multiple of TILE_H exercises the padded remainder tile
    img = jnp.asarray(rng.rand(70, 128).astype(np.float32) * 255)
    ref = np.asarray(_ref(img))
    out = np.asarray(fast_nms_pallas(img))
    np.testing.assert_allclose(out[3:-3, 3:-3], ref[3:-3, 3:-3],
                               rtol=0, atol=1e-5)

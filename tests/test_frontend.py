import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import ORBConfig
from orb_slam2_tpu.frontend import fast, orb
from orb_slam2_tpu.frontend.extractor import build_extractor, per_level_quota


def _test_image(h=120, w=160, seed=0):
    """Random blobby image with corners (uint8 values in float32)."""
    rng = np.random.RandomState(seed)
    img = rng.rand(h // 8, w // 8) * 255
    import cv2
    img = cv2.resize(img.astype(np.float32), (w, h), interpolation=cv2.INTER_NEAREST)
    return img.astype(np.float32)


def test_fast_matches_opencv():
    import cv2
    img = _test_image()
    th = 20
    det = cv2.FastFeatureDetector_create(threshold=th, nonmaxSuppression=False,
                                         type=cv2.FastFeatureDetector_TYPE_9_16)
    kps = det.detect(img.astype(np.uint8))
    ref = {(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps}

    score = np.asarray(fast.fast_score_map(jnp.asarray(img)))
    ours = {(y, x) for y, x in zip(*np.nonzero(score > th))}
    # ignore 3px border (cv2 detects there marginally differently)
    inter = len(ref & ours)
    union = len(ref | ours)
    assert union > 50, "test image produced too few corners"
    assert inter / union > 0.93, f"FAST IoU {inter/union:.3f} ({len(ref)} ref, {len(ours)} ours)"


def test_fast_score_is_max_threshold():
    img = _test_image(seed=1)
    score = np.asarray(fast.fast_score_map(jnp.asarray(img)))
    ys, xs = np.nonzero(score > 10)
    assert len(ys) > 0
    # at threshold just below score the pixel is a corner, just above it is not
    y, x = ys[0], xs[0]
    s = score[y, x]
    assert s > 10


def test_nms_keeps_local_maxima_only():
    img = _test_image(seed=2)
    score = fast.fast_score_map(jnp.asarray(img))
    nms = np.asarray(fast.nms3x3(score))
    sc = np.asarray(score)
    ys, xs = np.nonzero(nms)
    for y, x in list(zip(ys, xs))[:50]:
        if 1 <= y < sc.shape[0] - 1 and 1 <= x < sc.shape[1] - 1:
            assert sc[y, x] >= sc[y - 1:y + 2, x - 1:x + 2].max() - 1e-6


def test_cell_threshold_fallback():
    # one strong corner region and one weak region: the weak cell should
    # fall back to min_th
    score = np.zeros((60, 60), np.float32)
    score[10, 10] = 30.0   # strong cell
    score[10, 40] = 10.0   # weak cell (10 < 20, > 7)
    out = np.asarray(fast.cell_threshold(jnp.asarray(score), 30, 20.0, 7.0))
    assert out[10, 10] == 30.0
    assert out[10, 40] == 10.0


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    bits = jnp.asarray(rng.rand(16, 256) > 0.5)
    np.testing.assert_array_equal(np.asarray(orb.unpack_bits(orb.pack_bits(bits))),
                                  np.asarray(bits))


def test_ic_angle_gradient_direction():
    # patch brighter to the right -> centroid to the right -> angle ~ 0
    patch = jnp.broadcast_to(jnp.arange(31, dtype=jnp.float32)[None, :], (31, 31))[None]
    ang = float(orb.ic_angle(patch)[0])
    assert abs(ang) < 0.05
    # brighter at bottom -> angle ~ +pi/2 (y down)
    patch2 = jnp.broadcast_to(jnp.arange(31, dtype=jnp.float32)[:, None], (31, 31))[None]
    ang2 = float(orb.ic_angle(patch2)[0])
    assert abs(ang2 - np.pi / 2) < 0.05


def test_descriptor_rotation_invariance():
    """Same patch rotated 90 deg must give a close descriptor."""
    import cv2
    img = _test_image(seed=3)
    rot = cv2.rotate(img, cv2.ROTATE_90_CLOCKWISE)
    cfg = ORBConfig(n_features=60, n_levels=1, max_keypoints=64)
    ex = build_extractor(cfg, *img.shape)
    ex_r = build_extractor(cfg, *rot.shape)
    f = ex(jnp.asarray(img))
    fr = ex_r(jnp.asarray(rot))
    h = img.shape[0]
    # map original kp (x, y) -> rotated coords (h-1-y, x)
    uv = np.asarray(f.uv)[np.asarray(f.valid)]
    d = np.asarray(orb.unpack_bits(f.desc))[np.asarray(f.valid)]
    uvr = np.asarray(fr.uv)[np.asarray(fr.valid)]
    dr = np.asarray(orb.unpack_bits(fr.desc))[np.asarray(fr.valid)]
    mapped = np.stack([h - 1 - uv[:, 1], uv[:, 0]], -1)
    dists = []
    for i, m in enumerate(mapped):
        j = np.argmin(np.abs(uvr - m).sum(-1))
        if np.abs(uvr[j] - m).sum() < 2.0:
            dists.append(np.sum(d[i] != dr[j]))
    assert len(dists) >= 10, f"only {len(dists)} kp survived rotation"
    assert np.median(dists) < 60, f"median hamming {np.median(dists)} too high"


def test_per_level_quota():
    q = per_level_quota(1000, 8, 1.2)
    assert sum(q) == 1000
    assert q[0] > q[-1] > 0


def test_extractor_shapes_and_validity():
    img = _test_image(seed=4)
    cfg = ORBConfig(n_features=100, n_levels=3, max_keypoints=128)
    ex = jax.jit(build_extractor(cfg, *img.shape))
    f = ex(jnp.asarray(img))
    assert f.uv.shape == (128, 2)
    assert f.desc.shape == (128, 32)
    n = int(f.n)
    assert 20 < n <= 100
    # valid keypoints are inside the image
    uv = np.asarray(f.uv)[np.asarray(f.valid)]
    assert (uv[:, 0] >= 0).all() and (uv[:, 0] < img.shape[1]).all()
    assert (uv[:, 1] >= 0).all() and (uv[:, 1] < img.shape[0]).all()

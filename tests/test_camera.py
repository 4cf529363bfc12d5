import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import CameraConfig, tum1_config
from orb_slam2_tpu.core import camera


def test_project_unproject_roundtrip():
    cfg = CameraConfig()
    K = camera.intrinsics(cfg)
    uv = jax.random.uniform(jax.random.PRNGKey(0), (128, 2)) * jnp.asarray([640., 480.])
    depth = jax.random.uniform(jax.random.PRNGKey(1), (128,)) * 5 + 0.5
    p = camera.unproject(K, uv, depth)
    uv2 = camera.project(K, p)
    np.testing.assert_allclose(uv, uv2, atol=1e-3)
    np.testing.assert_allclose(p[:, 2], depth, atol=1e-6)


def test_undistort_identity_when_no_distortion():
    cfg = CameraConfig()
    K, d = camera.intrinsics(cfg), camera.distortion(cfg)
    uv = jnp.asarray([[100.0, 200.0], [320.0, 240.0]])
    np.testing.assert_allclose(camera.undistort_points(K, d, uv), uv, atol=1e-4)


def test_undistort_matches_opencv():
    import cv2
    cfg = tum1_config().camera
    K = camera.intrinsics(cfg)
    d = camera.distortion(cfg)
    uv = np.random.RandomState(0).rand(64, 2).astype(np.float32) * [400, 300] + [120, 90]
    Kcv = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]], np.float32)
    dcv = np.array([cfg.k1, cfg.k2, cfg.p1, cfg.p2, cfg.k3], np.float32)
    ref = cv2.undistortPoints(uv.reshape(-1, 1, 2), Kcv, dcv, P=Kcv).reshape(-1, 2)
    ours = np.asarray(camera.undistort_points(K, d, jnp.asarray(uv), iters=20))
    np.testing.assert_allclose(ours, ref, atol=0.1)


def test_stereo_right_u():
    cfg = CameraConfig(bf=40.0)
    K = camera.intrinsics(cfg)
    uv = jnp.asarray([[320.0, 240.0]])
    uR = camera.stereo_right_u(K, cfg.bf, uv, jnp.asarray([2.0]))
    np.testing.assert_allclose(uR, [300.0], atol=1e-5)


def test_in_image():
    bounds = jnp.asarray([0.0, 640.0, 0.0, 480.0])
    uv = jnp.asarray([[10.0, 10.0], [-1.0, 10.0], [639.5, 479.5], [640.0, 0.0]])
    np.testing.assert_array_equal(camera.in_image(uv, bounds),
                                  [True, False, True, False])

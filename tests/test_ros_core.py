"""ROS node message-conversion cores (io/ros.py) — testable without rospy."""

import numpy as np

from orb_slam2_tpu.io.ros import _to_depth, _to_gray


def test_to_gray_passthrough_mono():
    img = (np.arange(12, dtype=np.uint8).reshape(3, 4))
    out = _to_gray(img)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_to_gray_rgb_vs_bgr():
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 100          # R channel (if RGB)
    g_rgb = _to_gray(img, rgb=True)
    g_bgr = _to_gray(img, rgb=False)
    # R weighs 0.299 in RGB order, 0.114 in BGR order (Tracking.cc:172-197)
    assert abs(g_rgb[0, 0] - 29.9) < 0.5
    assert abs(g_bgr[0, 0] - 11.4) < 0.5


def test_to_depth_uint16_scaling_and_float_passthrough():
    d16 = np.full((2, 2), 5000, np.uint16)
    out = _to_depth(d16, factor=5000.0)
    np.testing.assert_allclose(out, 1.0)
    df = np.full((2, 2), 1.25, np.float32)
    np.testing.assert_allclose(_to_depth(df, factor=5000.0), 1.25)

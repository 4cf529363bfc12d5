"""Headless rendering surfaces (viz/viewer.py): map render, trajectory
render, and the FrameDrawer-equivalent frame render (FrameDrawer.cc:38-165).
"""

import os

import numpy as np

from orb_slam2_tpu.viz.viewer import (render_frame, render_map,
                                      render_trajectory)


def test_render_frame_writes_overlay(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(120, 160) * 255
    uv = rng.rand(64, 2) * [160, 120]
    valid = rng.rand(64) > 0.3
    pids = np.where(rng.rand(64) > 0.5, np.arange(64), -1)
    out = render_frame(img, uv, valid, pids, status=2, n_kf=5, n_mp=321,
                       out_path=str(tmp_path / "frame.png"))
    assert os.path.getsize(out) > 1000


def test_render_frame_states(tmp_path):
    img = np.zeros((60, 80))
    uv = np.zeros((4, 2))
    for status in (0, 1, 3):
        out = render_frame(img, uv, np.zeros(4, bool),
                           np.full(4, -1), status, 0, 0,
                           str(tmp_path / f"f{status}.png"))
        assert os.path.getsize(out) > 0


def test_render_trajectory(tmp_path):
    t = np.linspace(0, 2 * np.pi, 50)
    twc = np.zeros((50, 7))
    twc[:, 0] = 1
    twc[:, 4] = np.cos(t)
    twc[:, 6] = np.sin(t)
    out = render_trajectory(twc, str(tmp_path / "traj.png"), gt_twc=twc)
    assert os.path.getsize(out) > 0

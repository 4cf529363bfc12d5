"""Real-format ingestion test (VERDICT r3 item 9): dump the synthetic
sequence to TUM's on-disk layout, then run it through the full CLI path
(`tpu-slam run --dataset tum`) — loaders (io/datasets.py), reference-format
YAML settings (io/settings.py), the SLAM facade, and trajectory export all
exercised end-to-end, matching the reference's de-facto harness behavior
(mono_tum.cc:128-155, rgbd_tum.cc).
"""

import os

import numpy as np
import pytest

from orb_slam2_tpu import config as config_mod
from orb_slam2_tpu.config import MONOCULAR
from orb_slam2_tpu.io import evaluate, synthetic

CAM = dict(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240,
           fps=30.0)
N_FRAMES = 50
DEPTH_FACTOR = 5000.0


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """Synthetic sequence written as a TUM RGB-D directory: rgb/ + rgb.txt,
    depth/ (16-bit png, factor 5000) + depth.txt, and a reference-format
    cv::FileStorage YAML settings file."""
    import cv2

    cam = config_mod.CameraConfig(**CAM)
    seq = synthetic.generate(cam, n_frames=N_FRAMES, n_points=100,
                             trajectory="xyz", seed=0)
    root = tmp_path_factory.mktemp("tum_seq")
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    rgb_lines, depth_lines = [], []
    for f in range(N_FRAMES):
        t = seq.timestamps[f]
        rp, dp = f"rgb/{t:.6f}.png", f"depth/{t:.6f}.png"
        cv2.imwrite(str(root / rp),
                    np.clip(seq.images[f], 0, 255).astype(np.uint8))
        cv2.imwrite(str(root / dp),
                    (seq.depths[f] * DEPTH_FACTOR).astype(np.uint16))
        rgb_lines.append(f"{t:.6f} {rp}")
        depth_lines.append(f"{t:.6f} {dp}")
    (root / "rgb.txt").write_text(
        "# color images\n# timestamp filename\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text(
        "# depth images\n# timestamp filename\n" + "\n".join(depth_lines) + "\n")

    yaml = root / "settings.yaml"
    yaml.write_text(f"""%YAML:1.0

Camera.fx: {CAM['fx']}
Camera.fy: {CAM['fy']}
Camera.cx: {CAM['cx']}
Camera.cy: {CAM['cy']}
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: {CAM['width']}
Camera.height: {CAM['height']}
Camera.fps: {CAM['fps']}
Camera.bf: 16.0
Camera.RGB: 1
ThDepth: 35.0
DepthMapFactor: {DEPTH_FACTOR}

ORBextractor.nFeatures: 500
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7

TPU.maxKeypoints: 512
TPU.maxKeyframes: 96
TPU.maxPoints: 6144
TPU.maxFrames: 512
TPU.localBAPoints: 2048
""")
    return root, seq, yaml


def _run_cli(args):
    from orb_slam2_tpu import cli
    cli.main(args)


def _ate_from_file(path, seq, align_scale):
    rows = np.loadtxt(path)
    assert rows.ndim == 2 and rows.shape[1] == 8, rows.shape
    # TUM line: t tx ty tz qx qy qz qw -> [F, 7] wxyz + t
    est = np.concatenate([rows[:, [7, 4, 5, 6]], rows[:, 1:4]], axis=1)
    ie, ig = evaluate.match_timestamps(rows[:, 0], seq.timestamps)
    assert len(ie) >= 10, f"only {len(ie)} exported poses"
    return evaluate.ate_rmse(est[ie], seq.poses_twc[ig],
                             align_scale=align_scale), len(ie)


def test_tum_mono_cli(tum_dir, tmp_path):
    root, seq, yaml = tum_dir
    out = str(tmp_path / "traj_mono.txt")
    _run_cli(["run", "--dataset", "tum", "--sensor", "mono",
              "--path", str(root), "--settings", str(yaml),
              "--output", out])
    ate, n = _ate_from_file(out, seq, align_scale=True)
    assert n >= 0.7 * N_FRAMES, f"tracked {n}/{N_FRAMES}"
    assert ate <= 0.03, f"ATE {ate:.4f} m"


def test_tum_rgbd_cli(tum_dir, tmp_path):
    root, seq, yaml = tum_dir
    out = str(tmp_path / "traj_rgbd.txt")
    _run_cli(["run", "--dataset", "tum", "--sensor", "rgbd",
              "--path", str(root), "--settings", str(yaml),
              "--output", out])
    # metric ATE: the 16-bit depth quantization (0.2 mm) is negligible
    ate, n = _ate_from_file(out, seq, align_scale=False)
    assert n >= 0.8 * N_FRAMES, f"tracked {n}/{N_FRAMES}"
    assert ate <= 0.03, f"metric ATE {ate:.4f} m"

"""KITTI / EuRoC on-disk ingestion e2e (VERDICT r4 item 7): write the
reference's directory layouts from the synthetic stereo sequence, then run
the full CLI path — loaders (io/datasets.py:86-117), EuRoC online
rectification (euroc_rectify_maps, reference stereo_euroc.cc), the SLAM
facade and trajectory export (stereo_kitti.cc / stereo_euroc.cc behavior).
"""

import os

import numpy as np
import pytest

from orb_slam2_tpu import config as config_mod
from orb_slam2_tpu.io import evaluate, synthetic

CAM = dict(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240,
           fps=30.0, bf=16.0, th_depth=35.0)
N_FRAMES = 40

SETTINGS_COMMON = """%YAML:1.0

Camera.fx: 200.0
Camera.fy: 200.0
Camera.cx: 160.0
Camera.cy: 120.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 320
Camera.height: 240
Camera.fps: 30.0
Camera.bf: 16.0
Camera.RGB: 1
ThDepth: 35.0

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
"""

_MAT = ("!!opencv-matrix\n   rows: {r}\n   cols: {c}\n   dt: d\n"
        "   data: [{d}]")


def _mat(r, c, vals):
    return _MAT.format(r=r, c=c, d=", ".join(f"{v:.6f}" for v in vals))


@pytest.fixture(scope="module")
def stereo_seq():
    cam = config_mod.CameraConfig(**CAM)
    seq = synthetic.generate(cam, n_frames=N_FRAMES, n_points=300,
                             trajectory="xyz", seed=0)
    right = synthetic.generate(
        cam, n_frames=N_FRAMES, n_points=4, trajectory="xyz", seed=0,
        poses_override=synthetic.right_poses(seq.poses_twc,
                                             cam.baseline)).images
    return seq, right


def _run_cli(args):
    from orb_slam2_tpu import cli
    cli.main(args)


def _ate_tum_format(path, seq):
    rows = np.loadtxt(path)
    est = np.concatenate([rows[:, [7, 4, 5, 6]], rows[:, 1:4]], axis=1)
    ie, ig = evaluate.match_timestamps(rows[:, 0], seq.timestamps)
    assert len(ie) >= 10, f"only {len(ie)} exported poses"
    return evaluate.ate_rmse(est[ie], seq.poses_twc[ig],
                             align_scale=False), len(ie)


def test_kitti_stereo_cli(stereo_seq, tmp_path):
    """KITTI odometry layout: image_0/ image_1/ + times.txt, KITTI-format
    trajectory export (per-frame 3x4 Twc, System.cc:419-472)."""
    import cv2
    seq, right = stereo_seq
    root = tmp_path / "kitti_00"
    os.makedirs(root / "image_0")
    os.makedirs(root / "image_1")
    for f in range(N_FRAMES):
        cv2.imwrite(str(root / "image_0" / f"{f:06d}.png"),
                    np.clip(seq.images[f], 0, 255).astype(np.uint8))
        cv2.imwrite(str(root / "image_1" / f"{f:06d}.png"),
                    np.clip(right[f], 0, 255).astype(np.uint8))
    (root / "times.txt").write_text(
        "\n".join(f"{t:.6e}" for t in seq.timestamps) + "\n")
    yaml = tmp_path / "kitti.yaml"
    yaml.write_text(SETTINGS_COMMON)
    out = str(tmp_path / "traj_kitti.txt")
    _run_cli(["run", "--dataset", "kitti", "--sensor", "stereo",
              "--path", str(root), "--settings", str(yaml),
              "--output", out])
    rows = np.loadtxt(out)           # KITTI format: 12 columns per frame
    assert rows.ndim == 2 and rows.shape[1] == 12, rows.shape
    assert rows.shape[0] >= 0.7 * N_FRAMES
    # metric translation check against ground truth
    est_t = rows[:, [3, 7, 11]]
    # exported rows follow the tracked frames in order; compare trajectory
    # span (full pose-level ATE is covered by the EuRoC variant below)
    gt_t = np.asarray(seq.poses_twc)[:, 4:7]
    span_est = np.linalg.norm(est_t.max(0) - est_t.min(0))
    span_gt = np.linalg.norm(gt_t.max(0) - gt_t.min(0))
    assert abs(span_est - span_gt) < 0.15 * max(span_gt, 1e-6), \
        (span_est, span_gt)
    assert np.isfinite(rows).all()


def test_euroc_stereo_cli(stereo_seq, tmp_path):
    """EuRoC mav0 layout with ns-stamped pngs + LEFT./RIGHT. rectification
    blocks (identity rectification — exercises the cv2 remap path,
    reference stereo_euroc.cc / EuRoC.yaml:35-80)."""
    import cv2
    seq, right = stereo_seq
    root = tmp_path / "MH01"
    cam0 = root / "mav0" / "cam0" / "data"
    cam1 = root / "mav0" / "cam1" / "data"
    os.makedirs(cam0)
    os.makedirs(cam1)
    for f in range(N_FRAMES):
        ns = int(seq.timestamps[f] * 1e9)
        cv2.imwrite(str(cam0 / f"{ns:019d}.png"),
                    np.clip(seq.images[f], 0, 255).astype(np.uint8))
        cv2.imwrite(str(cam1 / f"{ns:019d}.png"),
                    np.clip(right[f], 0, 255).astype(np.uint8))
    K = [CAM["fx"], 0, CAM["cx"], 0, CAM["fy"], CAM["cy"], 0, 0, 1]
    P = [CAM["fx"], 0, CAM["cx"], 0, 0, CAM["fy"], CAM["cy"], 0, 0, 0, 1, 0]
    R = [1, 0, 0, 0, 1, 0, 0, 0, 1]
    D = [0, 0, 0, 0, 0]
    blocks = []
    for side in ("LEFT", "RIGHT"):
        blocks.append(f"{side}.height: 240")
        blocks.append(f"{side}.width: 320")
        blocks.append(f"{side}.D: {_mat(1, 5, D)}")
        blocks.append(f"{side}.K: {_mat(3, 3, K)}")
        blocks.append(f"{side}.R: {_mat(3, 3, R)}")
        blocks.append(f"{side}.P: {_mat(3, 4, P)}")
    yaml = tmp_path / "euroc.yaml"
    yaml.write_text(SETTINGS_COMMON + "\n" + "\n".join(blocks) + "\n")
    out = str(tmp_path / "traj_euroc.txt")
    _run_cli(["run", "--dataset", "euroc", "--sensor", "stereo",
              "--path", str(root), "--settings", str(yaml),
              "--output", out])
    ate, n = _ate_tum_format(out, seq)
    assert n >= 0.7 * N_FRAMES, f"tracked {n}/{N_FRAMES}"
    assert ate <= 0.08, f"metric ATE {ate:.4f} m"

"""Dataset loaders: TUM RGB-D, KITTI odometry, EuRoC MAV.

Covers the reference example loaders (mono_tum.cc:128-155 rgb.txt parsing,
rgbd_tum associations, stereo_kitti timestamp files, stereo_euroc cam0/cam1
+ online rectification).  Images load via cv2 on the host; rectification
maps are precomputed once like the reference (stereo_euroc.cc).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class SequenceItem:
    timestamp: float
    rgb_path: Optional[str] = None
    depth_path: Optional[str] = None
    right_path: Optional[str] = None


def _imread_gray(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32)


def load_tum_mono(seq_dir: str) -> List[SequenceItem]:
    """Parse rgb.txt (reference LoadImages, mono_tum.cc:128-155)."""
    items = []
    with open(os.path.join(seq_dir, "rgb.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, path = line.split()[:2]
            items.append(SequenceItem(timestamp=float(t),
                                      rgb_path=os.path.join(seq_dir, path)))
    return items


def load_tum_rgbd(seq_dir: str, assoc_path: Optional[str] = None
                  ) -> List[SequenceItem]:
    """Parse an associations file (reference rgbd_tum.cc; README.md:157-167).
    If none given, associate rgb.txt and depth.txt by nearest timestamp
    (<= 20 ms), replicating the TUM associate.py tool."""
    if assoc_path and os.path.exists(assoc_path):
        items = []
        with open(assoc_path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                p = line.split()
                items.append(SequenceItem(
                    timestamp=float(p[0]),
                    rgb_path=os.path.join(seq_dir, p[1]),
                    depth_path=os.path.join(seq_dir, p[3])))
        return items
    rgb = load_tum_mono(seq_dir)
    depth = []
    with open(os.path.join(seq_dir, "depth.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, path = line.split()[:2]
            depth.append((float(t), os.path.join(seq_dir, path)))
    dts = np.asarray([d[0] for d in depth])
    items = []
    for it in rgb:
        j = int(np.argmin(np.abs(dts - it.timestamp)))
        if abs(dts[j] - it.timestamp) <= 0.02:
            items.append(SequenceItem(timestamp=it.timestamp,
                                      rgb_path=it.rgb_path,
                                      depth_path=depth[j][1]))
    return items


def load_kitti_stereo(seq_dir: str) -> List[SequenceItem]:
    """KITTI odometry layout: image_0/, image_1/, times.txt
    (reference stereo_kitti.cc LoadImages)."""
    with open(os.path.join(seq_dir, "times.txt")) as f:
        times = [float(x) for x in f.read().split()]
    items = []
    for i, t in enumerate(times):
        items.append(SequenceItem(
            timestamp=t,
            rgb_path=os.path.join(seq_dir, "image_0", f"{i:06d}.png"),
            right_path=os.path.join(seq_dir, "image_1", f"{i:06d}.png")))
    return items


def load_euroc_stereo(seq_dir: str, ts_file: Optional[str] = None
                      ) -> List[SequenceItem]:
    """EuRoC mav0 layout: cam0/data, cam1/data with ns timestamps
    (reference stereo_euroc.cc)."""
    cam0 = os.path.join(seq_dir, "mav0", "cam0", "data")
    cam1 = os.path.join(seq_dir, "mav0", "cam1", "data")
    names = sorted(os.listdir(cam0))
    items = []
    for n in names:
        if not n.endswith(".png"):
            continue
        t = float(n[:-4]) / 1e9
        p1 = os.path.join(cam1, n)
        if os.path.exists(p1):
            items.append(SequenceItem(timestamp=t,
                                      rgb_path=os.path.join(cam0, n),
                                      right_path=p1))
    return items


class SequenceReader:
    """Iterates (images..., timestamp) tuples with on-the-fly loading,
    optional depth scaling and stereo rectification."""

    def __init__(self, items: List[SequenceItem], sensor: str,
                 depth_factor: float = 5000.0, rectify=None):
        self.items = items
        self.sensor = sensor
        self.depth_factor = depth_factor
        self.rectify = rectify  # (map1x, map1y, map2x, map2y) or None

    def __len__(self):
        return len(self.items)

    def __iter__(self) -> Iterator[Tuple]:
        import cv2
        for it in self.items:
            img = _imread_gray(it.rgb_path)
            if self.sensor == "mono":
                yield img, it.timestamp
            elif self.sensor == "rgbd":
                d = cv2.imread(it.depth_path, cv2.IMREAD_UNCHANGED)
                depth = d.astype(np.float32) / self.depth_factor
                yield img, depth, it.timestamp
            else:
                right = _imread_gray(it.right_path)
                if self.rectify is not None:
                    m1x, m1y, m2x, m2y = self.rectify
                    img = cv2.remap(img, m1x, m1y, cv2.INTER_LINEAR)
                    right = cv2.remap(right, m2x, m2y, cv2.INTER_LINEAR)
                yield img, right, it.timestamp


def euroc_rectify_maps(yaml_path: str):
    """Build rectification maps from the LEFT./RIGHT. blocks of the
    reference's EuRoC stereo settings (Examples/Stereo/EuRoC.yaml:35-80)."""
    import cv2
    fs = cv2.FileStorage(yaml_path, cv2.FILE_STORAGE_READ)
    K_l = fs.getNode("LEFT.K").mat()
    K_r = fs.getNode("RIGHT.K").mat()
    P_l = fs.getNode("LEFT.P").mat()
    P_r = fs.getNode("RIGHT.P").mat()
    R_l = fs.getNode("LEFT.R").mat()
    R_r = fs.getNode("RIGHT.R").mat()
    D_l = fs.getNode("LEFT.D").mat()
    D_r = fs.getNode("RIGHT.D").mat()
    rows = int(fs.getNode("LEFT.height").real())
    cols = int(fs.getNode("LEFT.width").real())
    m1x, m1y = cv2.initUndistortRectifyMap(
        K_l, D_l, R_l, P_l[0:3, 0:3], (cols, rows), cv2.CV_32F)
    m2x, m2y = cv2.initUndistortRectifyMap(
        K_r, D_r, R_r, P_r[0:3, 0:3], (cols, rows), cv2.CV_32F)
    return m1x, m1y, m2x, m2y

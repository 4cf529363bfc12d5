"""Reference-compatible YAML settings loading.

Reads the same cv::FileStorage YAML files the reference ships
(Examples/**/*.yaml, parsed in Tracking.cc:53-147) and builds a SLAMConfig.
Missing keys default like the reference (silently 0 / fallback fps 30,
Tracking.cc:82-83).
"""

from __future__ import annotations

import math

from orb_slam2_tpu import config as cfg_mod


def _read(fs, key, default=0.0):
    node = fs.getNode(key)
    if node.empty():
        return default
    return node.real()


def load_settings(path: str, sensor: int) -> cfg_mod.SLAMConfig:
    import cv2
    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    if not fs.isOpened():
        raise FileNotFoundError(path)
    fps = _read(fs, "Camera.fps", 30.0) or 30.0
    width = int(_read(fs, "Camera.width", 640) or 640)
    height = int(_read(fs, "Camera.height", 480) or 480)
    cam = cfg_mod.CameraConfig(
        fx=_read(fs, "Camera.fx"), fy=_read(fs, "Camera.fy"),
        cx=_read(fs, "Camera.cx"), cy=_read(fs, "Camera.cy"),
        k1=_read(fs, "Camera.k1"), k2=_read(fs, "Camera.k2"),
        p1=_read(fs, "Camera.p1"), p2=_read(fs, "Camera.p2"),
        k3=_read(fs, "Camera.k3"),
        bf=_read(fs, "Camera.bf") if sensor != cfg_mod.MONOCULAR else 0.0,
        fps=fps, width=width, height=height,
        th_depth=_read(fs, "ThDepth", 35.0),
        depth_map_factor=_read(fs, "DepthMapFactor", 5000.0) or 1.0)
    n_feat = int(_read(fs, "ORBextractor.nFeatures", 1000) or 1000)
    # TPU-native extension keys (absent from reference YAMLs, silently
    # defaulted like every other key): fixed array capacities of the engine.
    max_kp = int(_read(fs, "TPU.maxKeypoints",
                       1 << max(9, math.ceil(math.log2(max(n_feat, 1))))))
    orb = cfg_mod.ORBConfig(
        n_features=n_feat,
        scale_factor=_read(fs, "ORBextractor.scaleFactor", 1.2) or 1.2,
        n_levels=int(_read(fs, "ORBextractor.nLevels", 8) or 8),
        ini_th_fast=int(_read(fs, "ORBextractor.iniThFAST", 20) or 20),
        min_th_fast=int(_read(fs, "ORBextractor.minThFAST", 7) or 7),
        max_keypoints=max_kp)
    tracking = cfg_mod.TrackingConfig(max_frames_hint=int(fps))
    cap = cfg_mod.Capacity(
        max_obs_per_kf=orb.max_keypoints,
        max_keyframes=int(_read(fs, "TPU.maxKeyframes", 512)),
        max_points=int(_read(fs, "TPU.maxPoints", 32768)),
        max_frames=int(_read(fs, "TPU.maxFrames", 8192)),
        local_ba_points=int(_read(fs, "TPU.localBAPoints", 8192)))
    return cfg_mod.SLAMConfig(sensor=sensor, camera=cam, orb=orb,
                              tracking=tracking, cap=cap)

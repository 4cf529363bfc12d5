"""Offline map / trajectory visualization.

The capability of the reference's Pangolin viewer stack (Viewer.cc:54-169,
MapDrawer.cc:44-228: map points, keyframe frusta, covisibility graph,
spanning tree, loop edges, camera track) rendered headlessly with matplotlib
— the TPU deployment target has no GUI, so the artifact is an image file
produced from a live `MapState` or a saved checkpoint.

CLI: `tpu-slam view --map map.npz --traj CameraTrajectory.txt --out map.png`
"""

from __future__ import annotations

import numpy as np


def _camera_centers(kf_pose: np.ndarray) -> np.ndarray:
    """[K, 7] Tcw (wxyz quat + t) -> camera centers C = -R^T t."""
    q = kf_pose[:, :4]
    t = kf_pose[:, 4:7]
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # R^T v computed via conjugate quaternion rotation
    qc = np.stack([w, -x, -y, -z], -1)
    qv = qc[:, 1:]
    tt = 2 * np.cross(qv, t)
    return -(t + qc[:, :1] * tt + np.cross(qv, tt))


def _axes_of(kf_pose: np.ndarray, scale: float):
    """Per-KF forward (+z) direction in world coords, for frustum glyphs."""
    q = kf_pose[:, :4]
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    qc = np.stack([w, -x, -y, -z], -1)
    fwd = np.tile(np.array([0.0, 0.0, 1.0]), (len(q), 1))
    qv = qc[:, 1:]
    tt = 2 * np.cross(qv, fwd)
    return (fwd + qc[:, :1] * tt + np.cross(qv, tt)) * scale


def render_map(state, out_path: str, traj: np.ndarray | None = None,
               elev: float = -65.0, azim: float = -90.0,
               min_covis: int = 15, title: str | None = None) -> str:
    """Render map points + keyframes + covisibility/spanning/loop edges
    (MapDrawer::DrawMapPoints/DrawKeyFrames behavior, MapDrawer.cc:44-177).

    `state`: MapState (device or numpy pytree); `traj`: optional [F, 7]
    Twc per-frame trajectory to overlay.  Returns out_path.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    kf_pose = np.asarray(state.kf_pose)
    kf_valid = np.asarray(state.kf_valid)
    mp_pos = np.asarray(state.mp_pos)
    mp_valid = np.asarray(state.mp_valid)
    covis = np.asarray(state.covis)
    loop_edge = np.asarray(state.loop_edge)
    parent = np.asarray(state.kf_parent)

    fig = plt.figure(figsize=(11, 9))
    ax = fig.add_subplot(111, projection="3d")
    pts = mp_pos[mp_valid]
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], -pts[:, 1], s=1.0, c="0.55",
                   alpha=0.5, linewidths=0, label=f"{len(pts)} map points")
    ks = np.nonzero(kf_valid)[0]
    C = _camera_centers(kf_pose)
    if len(ks):
        scale = max(np.ptp(C[ks], axis=0).max(), 1e-3) * 0.03
        F = _axes_of(kf_pose, scale)
        ax.scatter(C[ks, 0], C[ks, 2], -C[ks, 1], s=14, c="tab:blue",
                   marker="s", label=f"{len(ks)} keyframes")
        for k in ks:
            a, b = C[k], C[k] + F[k]
            ax.plot([a[0], b[0]], [a[2], b[2]], [-a[1], -b[1]],
                    c="tab:blue", lw=0.7, alpha=0.8)
        # covisibility edges (DrawKeyFrames graph, weight >= min_covis)
        seen = set()
        for k in ks:
            for j in ks[ks > k]:
                if covis[k, j] >= min_covis and (k, j) not in seen:
                    seen.add((k, j))
                    ax.plot([C[k, 0], C[j, 0]], [C[k, 2], C[j, 2]],
                            [-C[k, 1], -C[j, 1]], c="tab:green", lw=0.4,
                            alpha=0.35)
        # spanning tree
        for k in ks:
            p = parent[k]
            if p >= 0 and kf_valid[p]:
                ax.plot([C[k, 0], C[p, 0]], [C[k, 2], C[p, 2]],
                        [-C[k, 1], -C[p, 1]], c="0.3", lw=0.6, alpha=0.6)
        # loop edges
        li, lj = np.nonzero(np.triu(loop_edge))
        for k, j in zip(li, lj):
            ax.plot([C[k, 0], C[j, 0]], [C[k, 2], C[j, 2]],
                    [-C[k, 1], -C[j, 1]], c="tab:red", lw=1.6,
                    label="loop edge" if (k, j) == (li[0], lj[0]) else None)
    if traj is not None and len(traj):
        t = np.asarray(traj)[:, 4:7]
        ax.plot(t[:, 0], t[:, 2], -t[:, 1], c="tab:orange", lw=1.2,
                label="trajectory")
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_zlabel("-y")
    ax.view_init(elev=elev, azim=azim)
    ax.legend(loc="upper left", fontsize=8)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path


def render_frame(img: np.ndarray, uv: np.ndarray, kp_valid: np.ndarray,
                 pids: np.ndarray, status: int, n_kf: int, n_mp: int,
                 out_path: str, vo_flags: np.ndarray | None = None,
                 loc_only: bool = False, title: str | None = None) -> str:
    """Current-frame render: keypoint overlay + status bar — the headless
    equivalent of reference FrameDrawer::DrawFrame/DrawTextInfo
    (FrameDrawer.cc:38-165).

    Tracked map-point keypoints are drawn as green squares, temporal "VO"
    points (localization mode) blue, untracked keypoints as faint dots;
    the status bar reports mode, KF/MP counts and the match count.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(img)
    uv = np.asarray(uv)
    kp_valid = np.asarray(kp_valid).astype(bool)
    pids = np.asarray(pids)
    tracked = kp_valid & (pids >= 0)
    if vo_flags is not None:
        vo = kp_valid & np.asarray(vo_flags).astype(bool) & ~tracked
    else:
        vo = np.zeros_like(tracked)
    plain = kp_valid & ~tracked & ~vo

    h, w = img.shape[:2]
    fig, ax = plt.subplots(figsize=(w / 100.0, (h + 26) / 100.0), dpi=100)
    ax.imshow(img, cmap="gray", vmin=0, vmax=255, extent=[0, w, h, 0])
    if plain.any():
        ax.scatter(uv[plain, 0], uv[plain, 1], s=4, c="0.7", marker=".",
                   linewidths=0)
    if tracked.any():
        ax.scatter(uv[tracked, 0], uv[tracked, 1], s=22, facecolors="none",
                   edgecolors="lime", marker="s", linewidths=0.9)
    if vo.any():
        ax.scatter(uv[vo, 0], uv[vo, 1], s=22, facecolors="none",
                   edgecolors="deepskyblue", marker="s", linewidths=0.9)
    # status bar (FrameDrawer::DrawTextInfo, FrameDrawer.cc:129-165)
    states = {0: "WAITING FOR IMAGES", 1: "TRYING TO INITIALIZE",
              2: "LOCALIZATION | " if loc_only else "SLAM MODE | ",
              3: "TRACK LOST"}
    s = states.get(int(status), "?")
    if int(status) == 2:
        s += (f"KFs: {int(n_kf)}, MPs: {int(n_mp)}, "
              f"Matches: {int(tracked.sum())}")
        if vo.any():
            s += f", + VO matches: {int(vo.sum())}"
    ax.text(4, h + 16, s, fontsize=9, color="black",
            bbox=dict(facecolor="white", edgecolor="none", pad=1.5))
    ax.set_xlim(0, w)
    ax.set_ylim(h + 26, 0)
    ax.axis("off")
    if title:
        ax.set_title(title)
    fig.subplots_adjust(left=0, right=1, top=1, bottom=0)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def render_trajectory(est_twc: np.ndarray, out_path: str,
                      gt_twc: np.ndarray | None = None,
                      title: str | None = None) -> str:
    """2D top-down (x-z) trajectory plot, optionally against ground truth."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    e = np.asarray(est_twc)
    ax.plot(e[:, 4], e[:, 6], c="tab:blue", lw=1.3, label="estimate")
    if gt_twc is not None and len(gt_twc):
        g = np.asarray(gt_twc)
        ax.plot(g[:, 4], g[:, 6], c="0.6", lw=1.0, ls="--",
                label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.axis("equal")
    ax.legend()
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path

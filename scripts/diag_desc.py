"""Descriptor repeatability check on adjacent synthetic frames.

Uses the rendered depth map for exact optical flow: unproject each frame-a
keypoint with its depth, reproject into frame b, pair with the nearest
frame-b keypoint within 2 px.  Reports Hamming stats of TRUE pairs and gate
survival (th_low=50, ratio 0.7) plus angle stability.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu import config
from orb_slam2_tpu.io import synthetic
from orb_slam2_tpu.frontend import build_extractor
from orb_slam2_tpu.matching import hamming

cfg = config.SLAMConfig()


def quat_rot(q, v):
    w, x, y, z = q
    qv = np.array([x, y, z])
    t = 2 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def main():
    seq = synthetic.generate(cfg.camera, n_frames=12, n_points=500,
                             trajectory="xyz", seed=0)
    ext = jax.jit(build_extractor(cfg.orb, cfg.camera.height, cfg.camera.width))
    cam = cfg.camera

    a, b = 5, 6
    fa = ext(jnp.asarray(seq.images[a]))
    fb = ext(jnp.asarray(seq.images[b]))
    va, vb = np.asarray(fa.valid), np.asarray(fb.valid)
    ka = np.asarray(fa.uv)[va]
    da = np.asarray(fa.desc)[va]
    oa = np.asarray(fa.octave)[va]
    anga = np.asarray(fa.angle)[va]
    kb = np.asarray(fb.uv)[vb]
    db = np.asarray(fb.desc)[vb]
    angb = np.asarray(fb.angle)[vb]

    # exact flow a->b via rendered depth
    dep = seq.depths[a]
    ui = np.clip(np.round(ka[:, 0]).astype(int), 0, cam.width - 1)
    vi = np.clip(np.round(ka[:, 1]).astype(int), 0, cam.height - 1)
    z = dep[vi, ui]
    pc_a = np.stack([(ka[:, 0] - cam.cx) / cam.fx * z,
                     (ka[:, 1] - cam.cy) / cam.fy * z, z], -1)
    qa, ta = seq.poses_twc[a, :4], seq.poses_twc[a, 4:]
    qb, tb = seq.poses_twc[b, :4], seq.poses_twc[b, 4:]
    pw = np.stack([quat_rot(qa, p) for p in pc_a]) + ta
    qbc = qb * np.array([1, -1, -1, -1])
    pc_b = np.stack([quat_rot(qbc, p - tb) for p in pw])
    zb = pc_b[:, 2]
    ub = np.stack([cam.fx * pc_b[:, 0] / zb + cam.cx,
                   cam.fy * pc_b[:, 1] / zb + cam.cy], -1)

    d2 = ((ub[:, None, :] - kb[None]) ** 2).sum(-1)
    nn = d2.argmin(1)
    ok = (d2.min(1) < 4.0) & (z > 0.3)
    ia = np.nonzero(ok)[0]
    ib = nn[ok]
    print(f"true pairs: {len(ia)} / {len(ka)} kps "
          f"(kp repeatability {len(ia)/len(ka):.2f})")

    dist = np.asarray(hamming.hamming_matrix(jnp.asarray(da), jnp.asarray(db)))
    true_d = dist[ia, ib]
    print("true-pair Hamming: median", np.median(true_d),
          "mean", true_d.mean().round(1), "p90", np.percentile(true_d, 90))
    print("pass th_low(50):", (true_d <= 50).mean().round(3),
          "  pass th_high(100):", (true_d <= 100).mean().round(3))

    best_idx = dist[ia].argmin(1)
    srt = np.sort(dist[ia], axis=1)
    is_true_best = best_idx == ib
    rto = srt[:, 0] / np.maximum(srt[:, 1], 1)
    print("true pair is global best:", is_true_best.mean().round(3))
    print("best/second ratio: median", np.median(rto).round(3),
          " pass 0.7:", (rto < 0.7).mean().round(3),
          " pass 0.9:", (rto < 0.9).mean().round(3))

    dang = np.rad2deg(np.abs(np.angle(np.exp(1j * (anga[ia] - angb[ib])))))
    print("angle diff deg: median", np.median(dang).round(2),
          "p90", np.percentile(dang, 90).round(2))
    print("octave hist of true pairs:", np.bincount(oa[ia], minlength=8))


if __name__ == "__main__":
    main()

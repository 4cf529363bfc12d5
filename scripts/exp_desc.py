"""Descriptor-quality experiment harness.

Compares extractor variants (and cv2.ORB as an external reference point) on
adjacent synthetic frames using exact depth-based flow for ground-truth
keypoint pairs.  Reports repeatability, true-pair Hamming stats, gate pass
rates, and angle stability for each variant.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from orb_slam2_tpu.utils.platform import force_cpu_if_requested

force_cpu_if_requested()

import jax
import jax.numpy as jnp

from orb_slam2_tpu import config
from orb_slam2_tpu.io import synthetic

cfg = config.SLAMConfig()
cam = cfg.camera


def quat_rot(q, v):
    w, x, y, z = q
    qv = np.array([x, y, z])
    t = 2 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def true_pairs(seq, a, b, ka, kb, tol=4.0):
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
    ok = (d2.min(1) < tol) & (z > 0.3)
    return np.nonzero(ok)[0], nn[ok]


def popcount_matrix(da, db):
    x = da[:, None, :] ^ db[None, :, :]
    return np.unpackbits(x, axis=-1).sum(-1)


def report(name, seq, pairs, get_feats):
    reps, meds, p50s, p100s, bests, ratios, dangs = [], [], [], [], [], [], []
    for a, b in pairs:
        ka, da, anga = get_feats(a)
        kb, db, angb = get_feats(b)
        ia, ib = true_pairs(seq, a, b, ka, kb)
        if len(ia) < 10:
            continue
        dist = popcount_matrix(da, db)
        true_d = dist[ia, ib].astype(float)
        reps.append(len(ia) / max(len(ka), 1))
        meds.append(np.median(true_d))
        p50s.append((true_d <= 50).mean())
        p100s.append((true_d <= 100).mean())
        best_idx = dist[ia].argmin(1)
        bests.append((best_idx == ib).mean())
        srt = np.sort(dist[ia], axis=1)
        ratios.append((srt[:, 0] / np.maximum(srt[:, 1], 1) < 0.9).mean())
        if anga is not None:
            d = np.rad2deg(np.abs(np.angle(
                np.exp(1j * (anga[ia] - angb[ib])))))
            dangs.append(np.median(d))
    print(f"{name:26s} rep {np.mean(reps):.2f}  medH {np.mean(meds):5.1f}  "
          f"<=50 {np.mean(p50s):.2f}  <=100 {np.mean(p100s):.2f}  "
          f"best {np.mean(bests):.2f}  ratio.9 {np.mean(ratios):.2f}  "
          f"dAng {np.mean(dangs) if dangs else float('nan'):5.1f}")


def jax_variant(extract_fn):
    ext = jax.jit(extract_fn)
    cache = {}

    def get(f):
        if f not in cache:
            feats = ext(jnp.asarray(SEQ.images[f]))
            v = np.asarray(feats.valid)
            cache[f] = (np.asarray(feats.uv)[v], np.asarray(feats.desc)[v],
                        np.asarray(feats.angle)[v])
        return cache[f]
    return get


def cv2_variant(nfeatures=1000):
    import cv2
    orb = cv2.ORB_create(nfeatures=nfeatures, scaleFactor=1.2, nlevels=8,
                         fastThreshold=7)
    cache = {}

    def get(f):
        if f not in cache:
            img = SEQ.images[f].astype(np.uint8)
            kps, desc = orb.detectAndCompute(img, None)
            if desc is None:
                cache[f] = (np.zeros((0, 2)), np.zeros((0, 32), np.uint8),
                            np.zeros((0,)))
            else:
                uv = np.array([k.pt for k in kps], np.float32)
                ang = np.array([np.deg2rad(k.angle) for k in kps], np.float32)
                cache[f] = (uv, desc, ang)
        return cache[f]
    return get


def main():
    global SEQ
    n_frames = int(os.environ.get("FRAMES", "24"))
    SEQ = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=200,
                             trajectory="xyz", seed=0)
    pairs = [(4, 5), (10, 11), (14, 15), (4, 6), (10, 12)]

    from orb_slam2_tpu.frontend import build_extractor
    import orb_slam2_tpu.frontend.orb as orb_mod
    import orb_slam2_tpu.frontend.pyramid as pyr_mod

    orig_blur = pyr_mod.gaussian_blur
    orig_pattern = orb_mod.PATTERN

    def make_pattern(sigma, radius, seed=orb_mod._PATTERN_SEED):
        rng = np.random.RandomState(seed)
        pts = []
        while len(pts) < orb_mod.N_BITS * 2:
            p = rng.randn(2) * sigma
            if np.hypot(*p) <= radius:
                pts.append(np.round(p))
        return np.asarray(pts[:orb_mod.N_BITS * 2],
                          dtype=np.int32).reshape(orb_mod.N_BITS, 2, 2)

    def run(name, blur_sigma=2.0, ksize=7, pattern=None):
        pyr_mod.gaussian_blur = (
            lambda img, k=ksize, s=blur_sigma: orig_blur(img, k, s))
        orb_mod.PATTERN = pattern if pattern is not None else orig_pattern
        try:
            g = jax_variant(build_extractor(cfg.orb, cam.height, cam.width))
            report(name, SEQ, pairs, g)
        finally:
            pyr_mod.gaussian_blur = orig_blur
            orb_mod.PATTERN = orig_pattern

    run("ours (current)")
    report("cv2.ORB", SEQ, pairs, cv2_variant())
    run("blur s=3 k=9", blur_sigma=3.0, ksize=9)
    run("blur s=4 k=11", blur_sigma=4.0, ksize=11)
    run("tight pattern r=10", pattern=make_pattern(4.4, 10.0))
    run("tight r=10 + blur3", blur_sigma=3.0, ksize=9,
        pattern=make_pattern(4.4, 10.0))
    run("wide pattern r=13 s=8", pattern=make_pattern(8.0, 13.0))


if __name__ == "__main__":
    main()

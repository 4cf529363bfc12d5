"""Learn a discriminability-optimized BRIEF pattern (VERDICT r3 item 2).

The reference ships a hand-learned 256x4 test table (`bit_pattern_31_`,
ORBextractor.cc:150-407) produced by the ORB paper's offline procedure:
enumerate candidate point-pair tests, keep the 256 with bit-mean closest to
0.5 (max variance) and low pairwise correlation over a large patch corpus.
This script runs that procedure from scratch — original code, our own
corpus — on keypoint patches harvested from the synthetic room sequences:

  1. extract keypoints exactly like the runtime (pyramid -> FAST -> select),
     gather blurred 31x31 patches + IC angles;
  2. rotate every patch to canonical orientation (runtime steers the
     pattern instead — equivalent statistics);
  3. candidate tests = all pairs of grid offsets within radius 12;
  4. greedy selection by |mean-0.5| with max-abs-correlation threshold,
     relaxed until 256 tests are chosen.

Writes orb_slam2_tpu/data/brief_pattern.npy ([256, 2, 2] int32 (dy, dx)
pairs); frontend/orb.py picks it up at import.  Retrain the vocabulary
afterwards (scripts/train_vocab.py) — descriptor bytes change.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from orb_slam2_tpu.utils.platform import force_cpu_if_requested

force_cpu_if_requested()


def harvest_patches(max_patches=24000):
    import jax
    import jax.numpy as jnp
    from orb_slam2_tpu import config
    from orb_slam2_tpu.frontend import extractor, fast, orb, pyramid
    from orb_slam2_tpu.io import synthetic

    cfg = config.SLAMConfig()
    ocfg = cfg.orb
    quotas = extractor.per_level_quota(ocfg.n_features, ocfg.n_levels,
                                       ocfg.scale_factor)

    def patches_of(img):
        levels = pyramid.build_pyramid(img, ocfg.n_levels, ocfg.scale_factor)
        out_p, out_a, out_v = [], [], []
        for lvl, (quota, lv_img) in enumerate(zip(quotas, levels)):
            if quota == 0:
                continue
            smap = fast.cell_threshold(
                fast.nms3x3(fast.fast_score_map(lv_img)), ocfg.cell_size,
                float(ocfg.ini_th_fast), float(ocfg.min_th_fast))
            xy, _, valid = extractor._select_level(
                smap, quota, border=ocfg.edge_threshold - 3, n_grid=quota)
            blurred = pyramid.gaussian_blur(lv_img, ocfg.blur_ksize,
                                            ocfg.blur_sigma)
            p = orb.gather_patches(blurred, xy)
            out_p.append(p)
            out_a.append(orb.ic_angle(p))
            out_v.append(valid)
        return (jnp.concatenate(out_p), jnp.concatenate(out_a),
                jnp.concatenate(out_v))

    fn = jax.jit(patches_of)
    ps, angs = [], []
    for seed, traj in [(0, "xyz"), (1, "loop"), (2, "forward"), (3, "xyz")]:
        seq = synthetic.generate(cfg.camera, n_frames=8, n_points=400,
                                 trajectory=traj, seed=seed)
        for f in range(0, 8, 2):
            p, a, v = fn(jnp.asarray(seq.images[f], jnp.float32))
            v = np.asarray(v)
            ps.append(np.asarray(p)[v])
            angs.append(np.asarray(a)[v])
        print(f"harvested {traj}/{seed}: {sum(len(x) for x in ps)}",
              flush=True)
    P = np.concatenate(ps)[:max_patches]
    A = np.concatenate(angs)[:max_patches]
    return P.astype(np.float32), A.astype(np.float32)


def rotate_to_canonical(patches, angles):
    """Bilinear-resample every 31x31 patch rotated by -angle (so the
    dominant gradient direction is canonical)."""
    K = patches.shape[0]
    c = 15.0
    yy, xx = np.meshgrid(np.arange(31, dtype=np.float32),
                         np.arange(31, dtype=np.float32), indexing="ij")
    yy = yy - c
    xx = xx - c
    ca, sa = np.cos(angles)[:, None, None], np.sin(angles)[:, None, None]
    # sample source coords = R(+angle) applied to target offsets
    sx = xx[None] * ca - yy[None] * sa + c
    sy = xx[None] * sa + yy[None] * ca + c
    x0 = np.clip(np.floor(sx).astype(np.int32), 0, 29)
    y0 = np.clip(np.floor(sy).astype(np.int32), 0, 29)
    fx, fy = sx - x0, sy - y0
    fx = np.clip(fx, 0, 1)
    fy = np.clip(fy, 0, 1)
    ki = np.arange(K)[:, None, None]
    p00 = patches[ki, y0, x0]
    p01 = patches[ki, y0, x0 + 1]
    p10 = patches[ki, y0 + 1, x0]
    p11 = patches[ki, y0 + 1, x0 + 1]
    return (p00 * (1 - fy) * (1 - fx) + p01 * (1 - fy) * fx +
            p10 * fy * (1 - fx) + p11 * fy * fx)


def candidate_tests(radius=12, step=2):
    """All ordered pairs of offsets on a step-spaced grid inside `radius`,
    keeping pair distance >= 3 px (closer pairs compare nearly-equal blurred
    intensities — pure noise bits)."""
    pts = [(dy, dx)
           for dy in range(-radius, radius + 1, step)
           for dx in range(-radius, radius + 1, step)
           if dy * dy + dx * dx <= radius * radius]
    pts = np.asarray(pts, np.int32)
    n = len(pts)
    pairs = []
    for i in range(n):
        for j in range(i + 1, n):
            d2 = ((pts[i] - pts[j]) ** 2).sum()
            if d2 >= 9:
                pairs.append((pts[i], pts[j]))
    return np.asarray(pairs, np.int32)       # [C, 2, 2]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "orb_slam2_tpu", "data",
        "brief_pattern.npy")
    patches, angles = harvest_patches()
    print(f"{len(patches)} patches; rotating to canonical orientation ...",
          flush=True)
    canon = rotate_to_canonical(patches, angles)

    cands = candidate_tests()
    C = len(cands)
    print(f"{C} candidate tests; evaluating bits ...", flush=True)
    c15 = 15
    a = canon[:, cands[:, 0, 0] + c15, cands[:, 0, 1] + c15]   # [K, C]
    b = canon[:, cands[:, 1, 0] + c15, cands[:, 1, 1] + c15]
    bits = (a < b).astype(np.float32)                          # [K, C]
    mean = bits.mean(0)
    order = np.argsort(np.abs(mean - 0.5))
    K = bits.shape[0]
    centered = bits - mean[None, :]
    norm = np.sqrt((centered ** 2).sum(0)) + 1e-9

    chosen: list[int] = []
    thresh = 0.2
    while len(chosen) < 256 and thresh <= 0.8:
        for ci in order:
            if len(chosen) >= 256:
                break
            if ci in chosen:
                continue
            if abs(mean[ci] - 0.5) > 0.35:
                continue
            if chosen:
                sel = centered[:, chosen]                       # [K, n]
                corr = (centered[:, ci] @ sel) / (norm[ci] * norm[chosen])
                if np.abs(corr).max() >= thresh:
                    continue
            chosen.append(int(ci))
        print(f"  corr<{thresh:.2f}: {len(chosen)} chosen", flush=True)
        thresh += 0.1

    assert len(chosen) == 256, len(chosen)
    pat = cands[np.asarray(chosen)]                             # [256, 2, 2]
    np.save(out_path, pat.astype(np.int32))
    sel_mean = mean[np.asarray(chosen)]
    print(f"saved {out_path}; bit-mean range "
          f"[{sel_mean.min():.2f}, {sel_mean.max():.2f}]")


if __name__ == "__main__":
    main()

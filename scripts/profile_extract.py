"""Micro-benchmark of the ORB extraction stages on the live backend.

Times each sub-stage of the frame function separately to localize the cost.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu import config
from orb_slam2_tpu.frontend import extractor, fast, orb, pyramid

cfg = config.SLAMConfig()
H, W = cfg.camera.height, cfg.camera.width
rng = np.random.RandomState(0)
img_np = (rng.rand(H, W) * 255).astype(np.float32)


def timeit(name, fn, *args, n=20):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:34s} {dt:8.2f} ms")
    return out


def main():
    print("backend:", jax.devices()[0].platform)
    img = jnp.asarray(img_np)
    ocfg = cfg.orb
    quotas = extractor.per_level_quota(ocfg.n_features, ocfg.n_levels,
                                       ocfg.scale_factor)

    # 0. host->device transfer
    t0 = time.perf_counter()
    for _ in range(20):
        x = jax.device_put(img_np)
    jax.block_until_ready(x)
    print(f"{'h2d transfer (f32 img)':34s} {(time.perf_counter()-t0)/20*1000:8.2f} ms")

    timeit("pyramid", lambda im: pyramid.build_pyramid(
        im, ocfg.n_levels, ocfg.scale_factor), img)

    levels = pyramid.build_pyramid(img, ocfg.n_levels, ocfg.scale_factor)
    lv0 = levels[0]

    timeit("fast_score_map lvl0", fast.fast_score_map, lv0)
    timeit("nms3x3 lvl0", fast.nms3x3, lv0)
    timeit("cell_threshold lvl0",
           lambda s: fast.cell_threshold(s, ocfg.cell_size, 20.0, 7.0), lv0)

    smap = fast.cell_threshold(fast.nms3x3(fast.fast_score_map(lv0)),
                               ocfg.cell_size, 20.0, 7.0)
    timeit("select lvl0 (top_k)",
           lambda s: extractor._select_level(s, quotas[0],
                                             ocfg.edge_threshold - 3,
                                             quotas[0]), smap)
    xy, resp, valid = extractor._select_level(
        smap, quotas[0], ocfg.edge_threshold - 3, quotas[0])

    timeit("gaussian_blur lvl0", pyramid.gaussian_blur, lv0)
    blurred = pyramid.gaussian_blur(lv0)
    timeit("gather_patches lvl0", orb.gather_patches, blurred, xy)
    patches = orb.gather_patches(blurred, xy)
    timeit("ic_angle lvl0", orb.ic_angle, patches)
    ang = orb.ic_angle(patches)
    timeit("brief lvl0", orb.brief_descriptors, patches, ang)
    bits = orb.brief_descriptors(patches, ang)
    timeit("pack_bits lvl0", orb.pack_bits, bits)

    # all-levels fused stages
    def all_fast(im):
        lv = pyramid.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        return [fast.cell_threshold(fast.nms3x3(fast.fast_score_map(l)),
                                    ocfg.cell_size, 20.0, 7.0) for l in lv]
    timeit("pyramid+FAST+nms+cell all lvls", all_fast, img)

    def all_select(im):
        maps = all_fast(im)
        outs = []
        for q, s in zip(quotas, maps):
            outs.append(extractor._select_level(s, q, ocfg.edge_threshold - 3, q))
        return outs
    timeit("... + select all lvls", all_select, img)

    ext = extractor.build_extractor(ocfg, H, W)
    timeit("FULL extractor", ext, img)


if __name__ == "__main__":
    main()

"""Chained profile of extraction sub-stages with VARYING inputs.

profile_extract_chain.py fed the same (img, 0.0) into every iteration —
the axon tunnel memoizes identical RPCs and reports ~0.06 ms fantasy
numbers.  Here the carry scalar keeps a tiny nonzero drift so every call is
a genuinely new computation, still dependency-serialized.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu import config
from orb_slam2_tpu.frontend import extractor, fast, orb, pyramid
from orb_slam2_tpu.frontend.pallas_fast import fast_nms_pallas

N = int(os.environ.get("N", "10"))
cfg = config.SLAMConfig()
ocfg = cfg.orb
H, W = cfg.camera.height, cfg.camera.width


def chain(name, fn):
    """fn: img -> scalar; timed as N dependent calls with drifting input."""
    f = jax.jit(lambda img, c: fn(img + c * 1e-6) * 1e-9 + c + 1e-4)
    img = jnp.asarray(np.random.RandomState(0).rand(H, W) * 255, jnp.float32)
    c = jnp.float32(0.0)
    out = f(img, c)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(N):
        c = f(img, c)
    jax.block_until_ready(c)
    print(f"{name:34s} {(time.perf_counter() - t0) / N * 1000:8.2f} ms",
          flush=True)


def main():
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())
    quotas = extractor.per_level_quota(ocfg.n_features, ocfg.n_levels,
                                       ocfg.scale_factor)

    def smap_fn(lv):
        if on_tpu:
            return fast_nms_pallas(lv, interpret=False)
        return fast.nms3x3(fast.fast_score_map(lv))

    chain("pyramid (8 lvls)",
          lambda im: pyramid.build_pyramid(im, ocfg.n_levels,
                                           ocfg.scale_factor)[-1][0, 0])

    def fast_all(im):
        levels = pyramid.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        return sum(smap_fn(lv)[0, 0] for lv in levels)

    chain("+ FAST+NMS all lvls", fast_all)

    def cell_all(im):
        levels = pyramid.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        acc = 0.0
        for lv in levels:
            s = fast.cell_threshold(smap_fn(lv), ocfg.cell_size,
                                    float(ocfg.ini_th_fast),
                                    float(ocfg.min_th_fast))
            acc += s[0, 0]
        return acc

    chain("+ cell_threshold", cell_all)

    def select_all(im):
        levels = pyramid.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        acc = 0.0
        for q, lv in zip(quotas, levels):
            s = fast.cell_threshold(smap_fn(lv), ocfg.cell_size,
                                    float(ocfg.ini_th_fast),
                                    float(ocfg.min_th_fast))
            xy, resp, valid = extractor._select_level(
                s, q, border=ocfg.edge_threshold - 3, n_grid=q)
            acc += xy[0, 0]
        return acc

    chain("+ select (top_k)", select_all)

    def blur_all(im):
        levels = pyramid.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        return sum(pyramid.gaussian_blur(lv, ocfg.blur_ksize,
                                         ocfg.blur_sigma)[0, 0]
                   for lv in levels)

    chain("pyramid + blur only", blur_all)

    ext = extractor.build_extractor(ocfg, H, W)
    chain("FULL extractor", lambda im: ext(im).uv[0, 0])


if __name__ == "__main__":
    main()

"""Throughput-true profile of extraction sub-stages.

Methodology (the only one that survives the axon tunnel + XLA):
- every probe CONSUMES ALL of its outputs (sum over every array) so XLA
  cannot dead-code-eliminate stages;
- the consumed scalar is fed back into the next call's input so calls are
  dependency-serialized (no pipelining across iterations);
- blocked ONCE at the end; per-call time = total / N.

This measures steady-state device time per call — the quantity that bounds
end-to-end frames/s.
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


def consume(tree):
    return sum(jnp.sum(jnp.asarray(x, jnp.float32) * 1e-9)
               for x in jax.tree.leaves(tree))


def chain(name, fn):
    f = jax.jit(lambda img, c: consume(fn(img + c * 1e-6)) + c + 1e-4)
    img = jnp.asarray(np.random.RandomState(0).rand(H, W) * 255, jnp.float32)
    c = jnp.float32(0.0)
    # warm-up MUST be a real host fetch: block_until_ready alone can return
    # early through the axon tunnel and every later timing reads ~0.05 ms
    float(np.asarray(f(img, c)))
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(N):
        c = f(img, c)
    float(np.asarray(c))
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
                                           ocfg.scale_factor))

    def fast_all(im):
        levels = pyramid.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        return [smap_fn(lv) for lv in levels]

    chain("+ FAST+NMS all lvls", fast_all)

    def cell_all(im):
        levels = pyramid.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        return [fast.cell_threshold(smap_fn(lv), ocfg.cell_size,
                                    float(ocfg.ini_th_fast),
                                    float(ocfg.min_th_fast))
                for lv in levels]

    chain("+ cell_threshold", cell_all)

    def select_all(im):
        levels = pyramid.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        out = []
        for q, lv in zip(quotas, levels):
            s = fast.cell_threshold(smap_fn(lv), ocfg.cell_size,
                                    float(ocfg.ini_th_fast),
                                    float(ocfg.min_th_fast))
            out.append(extractor._select_level(
                s, q, border=ocfg.edge_threshold - 3, n_grid=q))
        return out

    chain("+ select (top_k)", select_all)

    def blur_all(im):
        levels = pyramid.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        return [pyramid.gaussian_blur(lv, ocfg.blur_ksize, ocfg.blur_sigma)
                for lv in levels]

    chain("pyramid + blur only", blur_all)

    def desc_all(im):
        levels = pyramid.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        out = []
        for q, lv in zip(quotas, levels):
            s = fast.cell_threshold(smap_fn(lv), ocfg.cell_size,
                                    float(ocfg.ini_th_fast),
                                    float(ocfg.min_th_fast))
            xy, resp, valid = extractor._select_level(
                s, q, border=ocfg.edge_threshold - 3, n_grid=q)
            b = pyramid.gaussian_blur(lv, ocfg.blur_ksize, ocfg.blur_sigma)
            p = orb.gather_patches(b, xy)
            ang = orb.ic_angle(p)
            bits = orb.brief_descriptors(p, ang)
            out.append((xy, resp, valid, ang, orb.pack_bits(bits)))
        return out

    chain("+ blur+patch+angle+brief", desc_all)

    ext = extractor.build_extractor(ocfg, H, W)
    chain("FULL extractor", ext)


if __name__ == "__main__":
    main()

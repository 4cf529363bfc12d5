"""Stage-by-stage chained profile of the atlas extractor (TPU).

Methodology: consume ALL outputs (defeats DCE), feed the consumed scalar
back into the next call's input (defeats pipelining), warm with a real
np.asarray fetch (block_until_ready alone can lie through the tunnel),
fetch once at the end.
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
from orb_slam2_tpu.frontend import atlas as A
from orb_slam2_tpu.frontend import fast, orb, pyramid
from orb_slam2_tpu.frontend.extractor import per_level_quota

cfg = config.SLAMConfig().orb
H, W = 480, 640
L = cfg.n_levels
B = 1
shapes = pyramid.level_shapes(H, W, L, cfg.scale_factor)
N = int(os.environ.get("N", "10"))


def consume(tree):
    return sum(jnp.sum(jnp.asarray(x, jnp.float32) * 1e-9)
               for x in jax.tree.leaves(tree))


def bench(name, fn):
    f = jax.jit(lambda img, c: consume(fn(img + c * 1e-6)) + c + 1e-4)
    rng = np.random.RandomState(0)
    img = ((np.cumsum(np.cumsum(rng.rand(H, W), 0), 1) % 7.0) * 30
           + rng.rand(H, W) * 40).astype(np.float32)
    x = jnp.asarray(img)
    float(np.asarray(f(x, jnp.float32(0.0))))
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(N):
        c = f(x, c)
    float(np.asarray(c))
    print(f"{name:30s} {(time.perf_counter() - t0) / N * 1000:8.2f} ms",
          flush=True)


def stage_pyramid(img):
    levels = [img[None]]
    for i in range(1, L):
        levels.append(jax.image.resize(levels[-1], (1,) + shapes[i],
                                       method="bilinear"))
    return levels


def stage_atlas(img):
    levels = stage_pyramid(img)
    return jnp.stack(
        [jax.vmap(lambda x: A._pad_to(x, H, W))(lv)
         if lv.shape[1:] != (H, W) else lv for lv in levels], 1
    ).reshape(L, H, W)


def stage_fast(img):
    from orb_slam2_tpu.frontend.pallas_fast import fast_nms_pallas
    levels = stage_pyramid(img)
    smaps = []
    for i in range(L):
        s = fast_nms_pallas(levels[i][0], interpret=False)
        smaps.append(A._pad_to(s, H, W) if s.shape != (H, W) else s)
    return jnp.stack(smaps), stage_atlas(img)


ext_full = None


def main():
    bench("pyramid", stage_pyramid)
    bench("pyramid+atlas pack", stage_atlas)
    bench("+ fast (pallas, 8 calls)", stage_fast)

    ex = A.build_atlas_extractor(cfg, H, W, use_pallas=True)
    bench("FULL atlas extract", ex)

    # isolate: blur convs on atlas
    def blur_only(img):
        at = stage_atlas(img)
        kv = jnp.asarray(pyramid._gauss_kernel1d(cfg.blur_ksize,
                                                 cfg.blur_sigma))
        x = at[:, None]
        r = cfg.blur_ksize // 2
        x = jax.lax.conv_general_dilated(x, kv.reshape(1, 1, -1, 1), (1, 1),
                                         [(r, r), (0, 0)])
        x = jax.lax.conv_general_dilated(x, kv.reshape(1, 1, 1, -1), (1, 1),
                                         [(0, 0), (r, r)])
        return x

    bench("pyramid+atlas+blurconvs", blur_only)


if __name__ == "__main__":
    main()

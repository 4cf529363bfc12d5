"""Diagnose mono initialization vs per-frame motion speed.

For sequences of various lengths (same path, different frames/seq = motion
speed), report per candidate pair: #keypoints, #init matches, twoview ok.
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
from orb_slam2_tpu.frontend import build_extractor
from orb_slam2_tpu.matching import search
from orb_slam2_tpu.solvers import twoview


def main():
    cfg = config.SLAMConfig()
    ext = jax.jit(build_extractor(cfg.orb, cfg.camera.height,
                                  cfg.camera.width))
    key = jax.random.PRNGKey(0)

    match_jit = jax.jit(lambda f0, f1: search.search_for_initialization(
        f0.uv, f0.desc, f0.angle, f0.octave, f0.valid,
        f1.uv, f1.desc, f1.angle, f1.octave, f1.valid,
        window=float(cfg.match.init_window),
        max_dist=float(cfg.match.th_low), ratio=cfg.match.nn_ratio_init))

    K = jnp.asarray([cfg.camera.fx, cfg.camera.fy, cfg.camera.cx,
                     cfg.camera.cy])
    tv_jit = jax.jit(lambda k, uv1, uv2, v: twoview.initialize(
        k, K, uv1, uv2, v, cfg.init))

    for n_frames in (120, 60, 40):
        seq = synthetic.generate(cfg.camera, n_frames=n_frames, n_points=500,
                                 trajectory="xyz", seed=0)
        print(f"\n=== n_frames={n_frames} (motion x{120 // n_frames}) ===")
        f0 = ext(jnp.asarray(seq.images[0]))
        for f in range(1, min(16, n_frames)):
            f1 = ext(jnp.asarray(seq.images[f]))
            m = match_jit(f0, f1)
            nm = int(m.n)
            ok = "-"
            ngood = 0
            if nm >= cfg.tracking.min_init_matches:
                uv2 = f1.uv[jnp.clip(m.idx, 0, None)]
                key, sub = jax.random.split(key)
                res = tv_jit(sub, f0.uv, uv2, m.idx >= 0)
                ok = bool(res.ok)
                ngood = int(jnp.sum(res.good))
            print(f"0->{f:2d}: kps {int(f0.n)}/{int(f1.n)} matches {nm:4d} "
                  f"ok {ok} good {ngood}")


if __name__ == "__main__":
    main()

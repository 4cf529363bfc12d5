"""Bisect the frame_fn discrepancy: time the bare extractor closure and the
system's _frame_fn in the SAME process, before and after a SLAM warm run."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from orb_slam2_tpu.utils.platform import force_cpu_if_requested

force_cpu_if_requested()

import jax
import jax.numpy as jnp

from orb_slam2_tpu import config
from orb_slam2_tpu.frontend import extractor
from orb_slam2_tpu.io import synthetic
from orb_slam2_tpu.pipeline import frame as frame_mod


def stream_time(name, f, *args, n=30):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter() - t0) / n * 1000:8.2f} ms",
          flush=True)


def main():
    cfg = config.SLAMConfig()
    H, W = cfg.camera.height, cfg.camera.width
    rng = np.random.RandomState(0)
    img_rand = jnp.asarray((rng.rand(H, W) * 255).astype(np.float32))

    ext = jax.jit(extractor.build_extractor(cfg.orb, H, W))
    ffn = jax.jit(frame_mod.build_mono_frame_fn(cfg))

    stream_time("bare extractor (random img)", ext, img_rand)
    stream_time("frame_fn (random img)", ffn, img_rand, 0, np.float64(0.0))

    seq = synthetic.generate(cfg.camera, n_frames=2, n_points=300,
                             trajectory="xyz", seed=0)
    img_real = jnp.asarray(seq.images[0], jnp.float32)
    stream_time("bare extractor (real img)", ext, img_real)
    stream_time("frame_fn (real img)", ffn, img_real, 0, np.float64(0.0))

    # distinct inputs each call (defeat any result caching)
    imgs = [jnp.asarray((rng.rand(H, W) * 255).astype(np.float32))
            for _ in range(30)]
    jax.block_until_ready(imgs)
    out = ext(imgs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for im in imgs:
        out = ext(im)
    jax.block_until_ready(out)
    print(f"{'bare extractor (30 distinct imgs)':40s} "
          f"{(time.perf_counter() - t0) / 30 * 1000:8.2f} ms")




def main_postwarm():
    """Re-time after a full SLAM warm run in the same process."""
    cfg = config.SLAMConfig()
    from orb_slam2_tpu.pipeline.system import SLAM
    seq = synthetic.generate(cfg.camera, n_frames=40, n_points=300,
                             trajectory="xyz", seed=0)
    slam = SLAM(cfg)
    for f in range(40):
        slam.track_mono(seq.images[f], seq.timestamps[f])
    slam.flush()
    print("warm:", slam.status, int(slam.state.n_kf), flush=True)
    img = jnp.asarray(seq.images[0], jnp.float32)
    ext = jax.jit(extractor.build_extractor(cfg.orb, cfg.camera.height,
                                            cfg.camera.width))
    stream_time("bare extractor POST-warm", ext, img)
    stream_time("slam._frame_fn POST-warm",
                lambda im: slam._frame_fn(im, 0, np.float64(0.0)), img)
    ffn = jax.jit(frame_mod.build_mono_frame_fn(cfg))
    stream_time("fresh frame_fn POST-warm", ffn, img, 0, np.float64(0.0))


if __name__ == "__main__":
    main()
    main_postwarm()

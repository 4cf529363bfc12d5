"""Train the default bag-of-words vocabulary on synthetic-room descriptors.

The reference ships ORBvoc.txt (k=10, L=6, ~1M words) trained on a large
image corpus (TemplatedVocabulary.h).  Here the deployment corpus is the
synthetic room benchmark, so a k=10, L=4 (10k-word) tree trained on
descriptors harvested from several room sequences is the equivalent
artifact; place/vocab.py can also ingest ORBvoc.txt for real datasets.

Usage: python scripts/train_vocab.py [out.npz]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from orb_slam2_tpu import config
    from orb_slam2_tpu.frontend import build_extractor
    from orb_slam2_tpu.io import synthetic
    from orb_slam2_tpu.place.vocab import train_vocabulary

    cfg = config.SLAMConfig()
    ext = jax.jit(build_extractor(cfg.orb, cfg.camera.height,
                                  cfg.camera.width))
    descs = []
    for seed, traj in [(0, "xyz"), (1, "xyz"), (2, "loop"), (3, "forward")]:
        seq = synthetic.generate(cfg.camera, n_frames=24, n_points=400,
                                 trajectory=traj, seed=seed)
        for f in range(0, 24, 2):
            feats = ext(jnp.asarray(seq.images[f], jnp.float32))
            v = np.asarray(feats.valid)
            descs.append(np.asarray(feats.desc)[v])
        print(f"harvested seed={seed} traj={traj}: "
              f"{sum(len(d) for d in descs)} total descriptors")

    all_desc = np.concatenate(descs, 0)
    print("training on", len(all_desc), "descriptors ...")
    vocab = train_vocabulary(all_desc, k=cfg.vocab.branching,
                             depth=cfg.vocab.depth, seed=cfg.vocab.seed,
                             levels_up=cfg.vocab.levels_up)
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "orb_slam2_tpu", "data",
        "vocab_default.npz")
    vocab.save(out)
    print(f"saved {vocab.n_words}-word vocabulary to {out}")


if __name__ == "__main__":
    main()

"""Pallas TPU kernel: fused FAST-9 corner score + 3x3 NMS.

The hot loop of reference `ORBextractor::ComputeKeyPointsOctTree`
(ORBextractor.cc:765-853: per-cell cv::FAST with dual thresholds) as ONE
fused VMEM-resident pass: the 16 Bresenham-circle samples are 2-D rolls,
the FAST-9 arc minimum is a streaming min over the 16 rotations (three live
2-D temporaries — no [16, H, W] stack, which Mosaic tiles poorly), and
non-max suppression is eight more rolled maxes.  One HBM read of the image,
one write of the score map; the XLA formulation (frontend/fast.py)
materializes dozens of shifted intermediates.

Bit-compatible with `nms3x3(fast_score_map(img))` up to the 3-px border
(zeroed by both) — asserted by tests/test_pallas.py, which runs the same
kernel through the Pallas interpreter on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.frontend.fast import ARC_LEN, CIRCLE


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[y, x] = in[y+dy, x+dx], circular (wrap lands in the masked
    border).  Zero shifts are skipped — Mosaic rejects roll amount 0."""
    if dy:
        x = jnp.roll(x, -dy, 0)
    if dx:
        x = jnp.roll(x, -dx, 1)
    return x


TILE_H = 64     # output rows per grid step
HALO = 4        # 3 (circle radius) + 1 (NMS)


def _make_kernel(H: int, W: int):
    offs = [(int(dy), int(dx)) for dy, dx in CIRCLE]

    def kernel(prev_ref, cur_ref, next_ref, out_ref, raw_ref):
        from jax.experimental import pallas as pl

        # assemble the [TILE_H + 2*HALO, W] working tile from the current
        # block plus halo rows of its neighbors (BlockSpec blocks cannot
        # overlap; the same image is passed three times with index maps
        # i, i+1, i+2 over a T-row-padded copy)
        t = jnp.concatenate([prev_ref[TILE_H - HALO:, :], cur_ref[:],
                             next_ref[:HALO, :]], axis=0)

        def diff(r):
            dy, dx = offs[r % 16]
            return _shift(t, dy, dx) - t

        # streaming arc-min over the 16 rotations: score_b/d = max_r
        # min_{k<9}(+-diff[(r+k) % 16]); only a few 2-D temporaries live
        score_b = None
        score_d = None
        for r in range(16):
            acc_b = None
            acc_d = None
            for k in range(ARC_LEN):
                d = diff(r + k)
                acc_b = d if acc_b is None else jnp.minimum(acc_b, d)
                acc_d = -d if acc_d is None else jnp.minimum(acc_d, -d)
            score_b = acc_b if score_b is None else \
                jnp.maximum(score_b, acc_b)
            score_d = acc_d if score_d is None else \
                jnp.maximum(score_d, acc_d)
        score = jnp.maximum(jnp.maximum(score_b, score_d), 0.0)

        # zero the 3-px image border BEFORE NMS (fast_score_map's inside
        # mask); absolute row = i*TILE_H + local - HALO
        i = pl.program_id(0)
        rows = (jax.lax.broadcasted_iota(jnp.int32, score.shape, 0) +
                i * TILE_H - HALO)
        cols = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
        inside = ((rows >= 3) & (rows < H - 3) & (cols >= 3) & (cols < W - 3))
        score = jnp.where(inside, score, 0.0)
        raw_ref[:] = score[HALO:HALO + TILE_H, :]   # pre-NMS (subpixel fit)

        # 3x3 NMS (nms3x3): keep local maxima; wrap pollution stays in the
        # halo rows, which are sliced off
        m = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy, dx) == (0, 0):
                    continue
                s = _shift(score, dy, dx)
                m = s if m is None else jnp.maximum(m, s)
        out = jnp.where(score >= m, score, 0.0)
        out_ref[:] = out[HALO:HALO + TILE_H, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(img, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = img.shape
    n_tiles = -(-H // TILE_H)
    Hp = n_tiles * TILE_H
    # pad with one full extra tile top and bottom so the i-1/i+1 halo
    # blocks always exist
    imgp = jnp.pad(img, ((TILE_H, TILE_H + Hp - H), (0, 0)))

    spec = lambda off: pl.BlockSpec((TILE_H, W), lambda i, off=off: (i + off, 0),
                                    memory_space=pltpu.VMEM)
    out, raw = pl.pallas_call(
        _make_kernel(H, W),
        grid=(n_tiles,),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=[pl.BlockSpec((TILE_H, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Hp, W), img.dtype)] * 2,
        interpret=interpret,
    )(imgp, imgp, imgp)
    return out[:H], raw[:H]


def fast_nms_pallas(img: jnp.ndarray, interpret: bool | None = None
                    ) -> jnp.ndarray:
    """[H, W] image -> [H, W] FAST-9 corner score map after 3x3 NMS.

    Fused Pallas equivalent of `nms3x3(fast_score_map(img))`
    (frontend/fast.py; reference hot loop ORBextractor.cc:809-816).

    `interpret=None` auto-selects: compiled on TPU backends, interpreter
    elsewhere (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    return _run(img, interpret)[0]


def fast_nms_raw_pallas(img: jnp.ndarray, interpret: bool | None = None):
    """Like fast_nms_pallas but returns (nms_score, raw_score) — the raw
    pre-NMS map feeds the 3x3 parabola subpixel corner refinement
    (frontend/atlas.py; beyond reference parity, which keeps integer
    keypoints)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    return _run(img, interpret)

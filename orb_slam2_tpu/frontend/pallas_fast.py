"""Pallas TPU kernel: fused FAST-9 corner score + 3x3 NMS.

The hot loop of reference `ORBextractor::ComputeKeyPointsOctTree`
(ORBextractor.cc:765-853: per-cell cv::FAST with dual thresholds) runs here
as ONE fused pass over a row-tiled image: the 16 Bresenham-circle samples
are VMEM shifts, the FAST-9 arc minimum is a log-time doubling reduction
over the rotation axis, and non-max suppression reads the score tile with a
1-pixel halo — a single HBM read of the image and a single write of the
score map, where the XLA formulation (frontend/fast.py) materializes dozens
of shifted intermediates.

The jnp implementation stays as the reference semantics (and the CPU/test
path); `fast_nms_pallas` is bit-compatible with
`nms3x3(fast_score_map(img))` up to the 3-px border (zeroed by both) —
asserted by tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.frontend.fast import ARC_LEN, CIRCLE

TILE_H = 32     # rows per grid step (16-diff stack must fit VMEM)
HALO = 4        # 3 (circle radius) + 1 (NMS)


def _fast_nms_tile(t: jnp.ndarray, row0, H: int) -> jnp.ndarray:
    """[TILE_H + 2*HALO, W] image tile -> [TILE_H, W] NMS'd FAST-9 score.

    Row shifts are static slices into the halo; column shifts are lax.slice
    of a horizontally zero-padded copy (wrap-free, matches the jnp
    reference's zeroed border).  `row0` = absolute image row of the tile's
    first output row; the 3-px image border is zeroed BEFORE NMS exactly
    like the reference path (fast_score_map's inside mask).
    """
    H2, W = t.shape
    tp = jnp.pad(t, ((0, 0), (3, 3)))          # zero-pad columns

    # 16 circle diffs on the score region (+1 NMS halo): rows [3, H2-3)
    diffs = []
    for dy, dx in CIRCLE:
        dy, dx = int(dy), int(dx)
        sh = jax.lax.slice(tp, (3 + dy, 3 + dx), (H2 - 3 + dy, W + 3 + dx))
        diffs.append(sh - jax.lax.slice(tp, (3, 3), (H2 - 3, W + 3)))
    d = jnp.stack(diffs, 0)                    # [16, H2-6, W]

    def _rot(x, k):
        # circular shift along the rotation axis via static slicing
        # (jnp.roll on a non-lane axis is not Mosaic-friendly)
        return jnp.concatenate([x[k:], x[:k]], axis=0)

    def arc_min(x):
        # min over ARC_LEN=9 consecutive rotations: doubling trick
        m = jnp.minimum(x, _rot(x, 1))                          # width 2
        m = jnp.minimum(m, _rot(m, 2))                          # 4
        m = jnp.minimum(m, _rot(m, 4))                          # 8
        m = jnp.minimum(m, _rot(x, ARC_LEN - 1))                # 9
        return jnp.max(m, axis=0)

    score = jnp.maximum(jnp.maximum(arc_min(d), arc_min(-d)), 0.0)
    # zero the 3-px image border BEFORE NMS (matches fast_score_map's
    # inside mask — a border score must not suppress an interior neighbor)
    cols = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0) + row0 - 1
    inside = ((cols >= 3) & (cols < W - 3) & (rows >= 3) & (rows < H - 3))
    score = jnp.where(inside, score, 0.0)

    # 3x3 NMS on rows [1, 1+TILE_H) of the score region
    sp = jnp.pad(score, ((0, 0), (1, 1)))
    rows = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            rows.append(jax.lax.slice(
                sp, (1 + dy, 1 + dx), (1 + dy + TILE_H, 1 + dx + W)))
    center = jax.lax.slice(sp, (1, 1), (1 + TILE_H, 1 + W))
    m = functools.reduce(jnp.maximum, rows)
    return jnp.where(center >= m, center, 0.0)


def _make_kernel(H: int):
    def _kernel(img_ref, out_ref):
        # grid steps pick overlapping row windows (tile + halo) out of the
        # VMEM-resident image with dynamic slices — BlockSpec blocks cannot
        # overlap, so halos are handled inside the kernel instead
        import jax.experimental.pallas as pl
        i = pl.program_id(0)
        tile = img_ref[pl.ds(i * TILE_H, TILE_H + 2 * HALO), :]
        out_ref[pl.ds(i * TILE_H, TILE_H), :] = _fast_nms_tile(
            tile, i * TILE_H, H)
    return _kernel


def fast_nms_pallas(img: jnp.ndarray, interpret: bool | None = None
                    ) -> jnp.ndarray:
    """[H, W] image -> [H, W] FAST-9 corner score map after 3x3 NMS.

    Fused Pallas equivalent of `nms3x3(fast_score_map(img))`
    (frontend/fast.py; reference hot loop ORBextractor.cc:809-816).

    `interpret=None` auto-selects: compiled on TPU backends, interpreter
    elsewhere (CPU tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    H, W = img.shape
    n_tiles = -(-H // TILE_H)
    Hp = n_tiles * TILE_H
    # pad rows: HALO on top, HALO + tile remainder at the bottom
    imgp = jnp.pad(img, ((HALO, Hp - H + HALO), (0, 0)))

    out = pl.pallas_call(
        _make_kernel(H),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, W), img.dtype),
        interpret=interpret,
    )(imgp)
    # zero the 3-px row border like the reference (rows 0-2, H-3..H-1)
    rows = jnp.arange(H)[:, None]
    return jnp.where((rows >= 3) & (rows < H - 3), out[:H], 0.0)

"""Atlas-formulated ORB extraction: all pyramid levels (and both stereo
images) processed as ONE stacked array program.

The per-level formulation (extractor.build_extractor_perlevel) repeats a
~50-op chain per pyramid level; on hardware where per-op overhead dominates
(PERF.md) that is ~50 ms/frame.  Here every stage after the pyramid operates
on a zero-padded level atlas [G, Hp, Wp] (G = n_images * n_levels, Hp/Wp =
level-0 size), so the op count is independent of the level/image count:

  pyramid (cascade resize)  -> pad-stack into atlas
  FAST-9 + 3x3 NMS          -> fused Pallas kernel per level (frontend/
                               pallas_fast.py), ~0.07 ms each
  dual-threshold 30px cells -> ONE reshape/tile-max over the score atlas
                               (reference ORBextractor.cc:809-816 semantics:
                               cells are y//30 tiles at level resolution)
  spatial selection         -> fine-tile winners (reshape argmax) + 2x2
                               coarse-tile bonus + ONE small vmapped top_k
                               (the octree redistribution equivalent,
                               ORBextractor.cc:539-763: spatially balanced
                               max-response keypoints)
  blur                      -> ONE pair of separable convs over the atlas
  descriptors               -> ONE gather of all patches from the blurred
                               atlas + IC angle + rotated BRIEF, batched
                               over every keypoint of every level/image

Stereo passes n_images=2 so the L/R extraction that the reference runs in
two std::threads (Frame.cc:78-81) is a single batched program here.
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import ORBConfig
from orb_slam2_tpu.frontend import fast, orb, pyramid
from orb_slam2_tpu.frontend.extractor import Features, per_level_quota

FINE_TILE = 8       # fine selection tile (px, level coords): top-2 winners
COARSE = 2          # coarse cell = COARSE x COARSE fine tiles (bonus winners)
SUBPIXEL = True     # 3x3 parabola subpixel corner refinement (ablation flag)
Q_BINS = 30         # steered-BRIEF orientation bins (ORB paper: 2pi/30
                    # pattern discretization; reference rotates continuously,
                    # ORBextractor.cc:108-147 — binning lets all rotations be
                    # precomputed into one matmul)


def _brief_moment_matrix(Q: int) -> np.ndarray:
    """[961, Q*256 + 2] matrix computing, from a flat 31x31 patch, the
    BRIEF pair differences I(p2)-I(p1) for every orientation bin (bit =
    diff > 0) plus the IC-angle moments m10, m01 in the last two columns —
    turning all descriptor sampling gathers into ONE MXU matmul."""
    pat = orb.PATTERN.astype(np.float32)                 # [256, 2, (dy, dx)]
    D = np.zeros((orb.PATCH * orb.PATCH, Q * orb.N_BITS + 2), np.float32)
    for q in range(Q):
        th = 2.0 * np.pi * q / Q
        ca, sa = np.cos(th), np.sin(th)
        dy, dx = pat[..., 0], pat[..., 1]                # [256, 2]
        rx = np.round(dx * ca - dy * sa).astype(np.int64)
        ry = np.round(dx * sa + dy * ca).astype(np.int64)
        iy = np.clip(ry + orb.HALF, 0, orb.PATCH - 1)
        ix = np.clip(rx + orb.HALF, 0, orb.PATCH - 1)
        lin = iy * orb.PATCH + ix                        # [256, 2]
        cols = q * orb.N_BITS + np.arange(orb.N_BITS)
        np.add.at(D, (lin[:, 1], cols), 1.0)
        np.add.at(D, (lin[:, 0], cols), -1.0)
    D[:, -2] = (orb._MASK * orb._XX).reshape(-1)
    D[:, -1] = (orb._MASK * orb._YY).reshape(-1)
    return D


def _pad_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, h - x.shape[0]), (0, w - x.shape[1])))


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def build_atlas_extractor(cfg: ORBConfig, height: int, width: int,
                          n_images: int = 1, use_pallas: bool | None = None,
                          return_atlas: bool = False):
    """Return a jittable `extract(img)` closure.

    n_images == 1: img [H, W]            -> Features (cap slots)
    n_images >= 2: img [n_images, H, W]  -> Features batched [n_images, cap]

    With `return_atlas=True` also returns the raw padded level atlas
    [n_images * L, Hp, Wp] (zero beyond each level's extent) — the stereo
    SAD refinement samples windows from it at the keypoint's own pyramid
    level, like the reference's mvImagePyramid (Frame.cc:552-608).
    """
    L = cfg.n_levels
    quotas = per_level_quota(cfg.n_features, L, cfg.scale_factor)
    shapes = pyramid.level_shapes(height, width, L, cfg.scale_factor)
    maxq = max(quotas)
    cap = cfg.max_keypoints
    if sum(quotas) > cap:
        raise ValueError(f"max_keypoints {cap} < quota sum {sum(quotas)}")
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    B = n_images
    Hp, Wp = height, width
    border = cfg.edge_threshold - 3

    # ---- static per-level tables ----
    lvl_h = np.asarray([s[0] for s in shapes], np.int32)
    lvl_w = np.asarray([s[1] for s in shapes], np.int32)
    scale_pow = np.asarray([cfg.scale_factor ** i for i in range(L)],
                           np.float32)
    quota_arr = np.asarray(quotas, np.int32)

    # cell grid (30 px dual-threshold)
    cell = cfg.cell_size
    Hc, Wc = _ceil_to(Hp, cell), _ceil_to(Wp, cell)
    gy_c, gx_c = Hc // cell, Wc // cell

    # fine/coarse selection grids
    ft = FINE_TILE
    Hf, Wf = _ceil_to(Hp, ft * COARSE), _ceil_to(Wp, ft * COARSE)
    gy_f, gx_f = Hf // ft, Wf // ft
    n_fine = gy_f * gx_f

    def smap_fn(lv):
        """-> (nms_score, raw_score)."""
        if use_pallas:
            from orb_slam2_tpu.frontend.pallas_fast import fast_nms_raw_pallas
            return fast_nms_raw_pallas(lv, interpret=False)
        raw = fast.fast_score_map(lv)
        return fast.nms3x3(raw), raw

    blur_w = pyramid._gauss_kernel1d(cfg.blur_ksize, cfg.blur_sigma)

    def blur_atlas(atlas):
        """Separable Gaussian over [G, Hp, Wp] as shift-accumulates (~4x
        cheaper than conv HLOs here).  Rolls wrap at the atlas boundary;
        pollution is confined to the 4-px band at level-0 image borders,
        >11 px away from any selectable keypoint (border = 16)."""
        r = cfg.blur_ksize // 2
        rows = sum(jnp.roll(atlas, i - r, 1) * float(blur_w[i])
                   for i in range(cfg.blur_ksize))
        return sum(jnp.roll(rows, i - r, 2) * float(blur_w[i])
                   for i in range(cfg.blur_ksize))

    brief_mat = jnp.asarray(_brief_moment_matrix(Q_BINS))

    def extract(img: jnp.ndarray) -> Features:
        imgs = img[None] if B == 1 else img                  # [B, H, W]

        # ---- pyramid (cascade like the reference, ORBextractor.cc:1107) ----
        levels: List[jnp.ndarray] = [imgs]
        for i in range(1, L):
            levels.append(jax.image.resize(
                levels[-1], (B,) + shapes[i], method="bilinear"))
        atlas = jnp.stack(
            [jax.vmap(lambda x: _pad_to(x, Hp, Wp))(lv) if
             lv.shape[1:] != (Hp, Wp) else lv for lv in levels],
            axis=1).reshape(B * L, Hp, Wp)                   # [G, Hp, Wp]

        # ---- FAST-9 + NMS per level (Pallas on TPU) ----
        smaps, raws = [], []
        for b in range(B):
            for i in range(L):
                s, r = smap_fn(levels[i][b])
                if s.shape != (Hp, Wp):
                    s, r = _pad_to(s, Hp, Wp), _pad_to(r, Hp, Wp)
                smaps.append(s)
                raws.append(r)
        score = jnp.stack(smaps)                             # [G, Hp, Wp]
        raw = jnp.stack(raws)

        # ---- dual-threshold 30 px cells (ORBextractor.cc:809-816) ----
        G = B * L
        sc = jnp.pad(score, ((0, 0), (0, Hc - Hp), (0, Wc - Wp)))
        cmax = sc.reshape(G, gy_c, cell, gx_c, cell).max((2, 4))
        th = jnp.where(cmax > float(cfg.ini_th_fast),
                       float(cfg.ini_th_fast), float(cfg.min_th_fast))
        th_full = jnp.broadcast_to(th[:, :, None, :, None],
                                   (G, gy_c, cell, gx_c, cell)
                                   ).reshape(G, Hc, Wc)[:, :Hp, :Wp]
        score = jnp.where(score > th_full, score, 0.0)

        # ---- border mask (selection border = EDGE_THRESHOLD - 3) ----
        hl = jnp.asarray(np.tile(lvl_h, B))                  # [G]
        wl = jnp.asarray(np.tile(lvl_w, B))
        ys = jnp.arange(Hp)[None, :, None]
        xs = jnp.arange(Wp)[None, None, :]
        inside = ((ys >= border) & (ys < (hl[:, None, None] - border)) &
                  (xs >= border) & (xs < (wl[:, None, None] - border)))
        score = jnp.where(inside, score, 0.0)

        # ---- spatial selection: fine-tile top-2 + coarse-winner bonus ----
        # The octree redistribution equivalent (ORBextractor.cc:539-763):
        # coarse-cell winners are taken first (bonus), remaining quota fills
        # from the best leftovers — at most 2 per fine tile, which matches
        # the quadtree's max-response-per-node behavior at terminal depth.
        sf_ = jnp.pad(score, ((0, 0), (0, Hf - Hp), (0, Wf - Wp)))
        tiles = sf_.reshape(G, gy_f, ft, gx_f, ft).transpose(0, 1, 3, 2, 4)
        tiles = tiles.reshape(G, gy_f, gx_f, ft * ft)
        v2, l2 = jax.lax.top_k(tiles, 2)                     # [G, gyf, gxf, 2]
        wval, wloc = v2[..., 0], l2[..., 0].astype(jnp.int32)
        cmax2 = wval.reshape(G, gy_f // COARSE, COARSE,
                             gx_f // COARSE, COARSE).max((2, 4))
        is_cw = (wval >= jnp.repeat(jnp.repeat(cmax2, COARSE, 1), COARSE, 2)
                 ) & (wval > 0)
        prio1 = jnp.where(wval > 0, wval + is_cw * jnp.float32(1e6), -1.0)
        prio2 = jnp.where(v2[..., 1] > 0, v2[..., 1], -1.0)
        prio = jnp.stack([prio1.reshape(G, n_fine),
                          prio2.reshape(G, n_fine)], 1).reshape(G, 2 * n_fine)
        locs = jnp.stack([wloc.reshape(G, n_fine),
                          l2[..., 1].astype(jnp.int32).reshape(G, n_fine)],
                         1).reshape(G, 2 * n_fine)
        vals = jnp.stack([wval.reshape(G, n_fine),
                          v2[..., 1].reshape(G, n_fine)], 1
                         ).reshape(G, 2 * n_fine)
        if 2 * n_fine < maxq:    # tiny images: fewer tiles than the quota
            pad = maxq - 2 * n_fine
            prio = jnp.pad(prio, ((0, 0), (0, pad)), constant_values=-1.0)
        topv, topi = jax.lax.top_k(prio, maxq)               # [G, maxq]
        topi = jnp.minimum(topi, 2 * n_fine - 1)
        qual = jnp.asarray(np.tile(quota_arr, B))
        sel_valid = (topv > 0) & (jnp.arange(maxq)[None, :] < qual[:, None])
        fcell = topi % n_fine   # layout [2, n_fine]: idx = which*n_fine + cell
        cy, cx = fcell // gx_f, fcell % gx_f
        loc = jnp.take_along_axis(locs, topi, 1)
        y = cy * ft + loc // ft
        x = cx * ft + loc % ft
        resp = jnp.take_along_axis(vals, topi, 1)

        # ---- compact [B, L*maxq] -> [B, cap] (level-major order) ----
        KL = L * maxq
        y = y.reshape(B, KL)
        x = x.reshape(B, KL)
        resp = resp.reshape(B, KL)
        sel_valid = sel_valid.reshape(B, KL)
        lvl_of = jnp.broadcast_to(
            jnp.repeat(jnp.arange(L, dtype=jnp.int32), maxq)[None], (B, KL))
        order = jnp.where(sel_valid,
                          jnp.float32(KL) - jnp.arange(KL)[None, :], -1.0)
        if KL < cap:
            order = jnp.pad(order, ((0, 0), (0, cap - KL)),
                            constant_values=-1.0)
        ov, ci = jax.lax.top_k(order, cap)                   # [B, cap]
        ci = jnp.minimum(ci, KL - 1)
        take = lambda a: jnp.take_along_axis(a, ci, 1)
        ky, kx = take(y), take(x)
        kv = take(sel_valid) & (ov > 0)
        kl = take(lvl_of)
        kr = jnp.where(kv, take(resp), 0.0)

        # ---- subpixel corner refinement: 3x3 parabola on the raw (pre-NMS)
        # FAST score (beyond reference parity — ORBextractor keeps integer
        # keypoint coords; at 1.2^l level scaling the quantization error
        # dominates reprojection noise, so half-pixel recovery is free ATE)
        gk = (jnp.arange(B, dtype=jnp.int32)[:, None] * L + kl)  # [B, cap]
        rflat = raw.reshape(G * Hp, Wp)
        nstarts = jnp.stack([(gk * Hp + ky - 1).reshape(-1),
                             (kx - 1).reshape(-1)], -1)
        nb = jax.lax.gather(
            rflat, nstarts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(3, 3)).reshape(B, cap, 3, 3)
        def _para(l, c, r):
            den = l - 2.0 * c + r
            return jnp.where(jnp.abs(den) > 1e-6,
                             jnp.clip(0.5 * (l - r) / den, -0.5, 0.5), 0.0)
        if SUBPIXEL:
            sub_dx = _para(nb[..., 1, 0], nb[..., 1, 1], nb[..., 1, 2])
            sub_dy = _para(nb[..., 0, 1], nb[..., 1, 1], nb[..., 2, 1])
        else:
            sub_dx = sub_dy = jnp.zeros_like(kr)

        # ---- descriptors: one batched stage over all B*cap keypoints ----
        blurred = blur_atlas(atlas)                          # [G, Hp, Wp]
        g_idx = (jnp.arange(B, dtype=jnp.int32)[:, None] * L + kl
                 ).reshape(-1)                               # [B*cap]
        cyk = jnp.clip(ky.reshape(-1), orb.HALF, None)
        cxk = jnp.clip(kx.reshape(-1), orb.HALF, None)
        hs = jnp.asarray(np.tile(lvl_h, B))[g_idx]
        ws = jnp.asarray(np.tile(lvl_w, B))[g_idx]
        cyk = jnp.minimum(cyk, hs - orb.HALF - 1)
        cxk = jnp.minimum(cxk, ws - orb.HALF - 1)
        # patches as ONE gather of [31, 31] slices (K gather entries — a
        # scalar-element gather of K*961 entries costs ~13 ms on TPU, 2-D
        # slices ~4 ms)
        P = orb.PATCH
        Kk = B * cap
        flat = blurred.reshape(G * Hp, Wp)
        starts = jnp.stack([g_idx * Hp + cyk - orb.HALF,
                            cxk - orb.HALF], -1)             # [K, 2]
        patches = jax.lax.gather(
            flat, starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(P, P))                              # [K, 31, 31]
        # one matmul: all-bin BRIEF differences + IC moments
        allq = patches.reshape(Kk, P * P) @ brief_mat        # [K, Q*256 + 2]
        ang = jnp.arctan2(allq[:, -1], allq[:, -2])
        qbin = (jnp.round(ang * (Q_BINS / (2.0 * jnp.pi)))
                .astype(jnp.int32) % Q_BINS)
        diffs = jnp.take_along_axis(
            allq[:, :Q_BINS * orb.N_BITS].reshape(Kk, Q_BINS, orb.N_BITS),
            qbin[:, None, None], axis=1)[:, 0]               # [K, 256]
        desc = orb.pack_bits(diffs > 0)

        scale = jnp.asarray(scale_pow)[kl]                   # [B, cap]
        uv = jnp.stack([(kx.astype(jnp.float32) + sub_dx) * scale,
                        (ky.astype(jnp.float32) + sub_dy) * scale], -1)
        feats = Features(
            uv=uv, response=kr, octave=kl,
            angle=ang.reshape(B, cap), desc=desc.reshape(B, cap, 32),
            valid=kv)
        if B == 1:
            feats = jax.tree.map(lambda a: a[0], feats)
        if return_atlas:
            return feats, atlas
        return feats

    return extract

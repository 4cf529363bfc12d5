"""Keyframe database: loop-closure and relocalization candidate retrieval.

Replaces `KeyFrameDatabase` (KeyFrameDatabase.cc): where the reference scans
a per-word inverted file of keyframe lists, the TPU formulation keeps a dense
[K, W] BoW matrix in the map state and evaluates shared-word counts, L1
scores, and covisibility-group accumulation (the 0.8 / 0.75 gates of
KeyFrameDatabase.cc:113-193) as masked matrix-vector math over all keyframes
at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.place.vocab import l1_score, shared_words


class CandidateResult(NamedTuple):
    ids: jnp.ndarray     # [C] candidate keyframe ids (-1 padded)
    scores: jnp.ndarray  # [C] their accumulated-group scores


def _top_k_pad(x: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """top_k along the last axis, padded with -inf/-1 when k exceeds the axis."""
    n = x.shape[-1]
    vals, idx = jax.lax.top_k(x, min(k, n))
    if k > n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, k - n)]
        vals = jnp.pad(vals, pad, constant_values=-jnp.inf)
        idx = jnp.pad(idx, pad, constant_values=-1)
    return vals, idx


def detect_loop_candidates(kf_bow: jnp.ndarray, kf_valid: jnp.ndarray,
                           covis: jnp.ndarray, query: jnp.ndarray,
                           query_bow: jnp.ndarray, min_score: jnp.ndarray,
                           n_out: int = 8,
                           shared_frac: float = 0.8,
                           acc_frac: float = 0.75,
                           min_weight_connected: int = 15) -> CandidateResult:
    """Loop candidates for `query` (reference DetectLoopCandidates,
    KeyFrameDatabase.cc:76-197)."""
    K = kf_bow.shape[0]
    ok = kf_valid & (jnp.arange(K) != query)
    # exclude directly connected keyframes (KeyFrameDatabase.cc:96)
    connected = covis[query] >= min_weight_connected
    ok = ok & ~connected

    sw = shared_words(query_bow[None, :], kf_bow)       # [K]
    sw = jnp.where(ok, sw, 0)
    max_cw = jnp.max(sw)
    min_cw = (shared_frac * max_cw).astype(sw.dtype)

    scores = l1_score(query_bow[None, :], kf_bow)       # [K]
    cand = ok & (sw > min_cw) & (sw > 0) & (scores >= min_score)

    # covisibility-group accumulated score (KeyFrameDatabase.cc:147-173):
    # group of i = i + its top-10 covisible; accumulate scores of group
    # members that are themselves candidates; the group is represented by
    # its best-scoring member.
    w = jnp.where(kf_valid[None, :] & kf_valid[:, None], covis, 0)
    top_w, top_idx = jax.lax.top_k(w, min(10, K))       # [K, <=10]
    in_group = top_w > 0
    member_scores = jnp.where(cand[top_idx] & in_group, scores[top_idx], 0.0)
    acc = jnp.where(cand, scores, 0.0) + jnp.sum(member_scores, axis=1)
    member_best = jnp.max(jnp.where(cand[top_idx] & in_group,
                                    scores[top_idx], -jnp.inf), axis=1)
    member_arg = top_idx[jnp.arange(K),
                         jnp.argmax(jnp.where(cand[top_idx] & in_group,
                                              scores[top_idx], -jnp.inf), axis=1)]
    self_score = jnp.where(cand, scores, -jnp.inf)
    best_of_group = jnp.where(member_best > self_score, member_arg,
                              jnp.arange(K))
    acc = jnp.where(cand, acc, -jnp.inf)

    best_acc = jnp.max(acc)
    keep = acc > acc_frac * best_acc
    # deduplicate: several groups may elect the same representative
    rep = jnp.where(keep, best_of_group, -1)
    rep_score = jnp.where(keep, acc, -jnp.inf)
    # per representative keep max score
    seen = jnp.full((K + 1,), -jnp.inf).at[
        jnp.where(rep >= 0, rep, K)].max(rep_score)[:K]
    uniq_score = jnp.where(jnp.arange(K) >= 0, seen, -jnp.inf)
    top_s, top_i = _top_k_pad(uniq_score, n_out)
    ids = jnp.where(jnp.isfinite(top_s), top_i, -1).astype(jnp.int32)
    return CandidateResult(ids=ids, scores=top_s)


def detect_reloc_candidates(kf_bow: jnp.ndarray, kf_valid: jnp.ndarray,
                            covis: jnp.ndarray, query_bow: jnp.ndarray,
                            n_out: int = 8, shared_frac: float = 0.8,
                            acc_frac: float = 0.75) -> CandidateResult:
    """Relocalization candidates (reference DetectRelocalizationCandidates,
    KeyFrameDatabase.cc:199-309): same pipeline without the min-score gate
    and connection exclusion."""
    K = kf_bow.shape[0]
    ok = kf_valid
    sw = shared_words(query_bow[None, :], kf_bow)
    sw = jnp.where(ok, sw, 0)
    max_cw = jnp.max(sw)
    min_cw = (shared_frac * max_cw).astype(sw.dtype)
    scores = l1_score(query_bow[None, :], kf_bow)
    cand = ok & (sw > min_cw) & (sw > 0)

    w = jnp.where(kf_valid[None, :] & kf_valid[:, None], covis, 0)
    top_w, top_idx = jax.lax.top_k(w, min(10, K))
    in_group = top_w > 0
    member_scores = jnp.where(cand[top_idx] & in_group, scores[top_idx], 0.0)
    acc = jnp.where(cand, scores, 0.0) + jnp.sum(member_scores, axis=1)
    member_best_val = jnp.where(cand[top_idx] & in_group, scores[top_idx],
                                -jnp.inf)
    member_arg = top_idx[jnp.arange(K), jnp.argmax(member_best_val, axis=1)]
    self_score = jnp.where(cand, scores, -jnp.inf)
    best_of_group = jnp.where(jnp.max(member_best_val, 1) > self_score,
                              member_arg, jnp.arange(K))
    acc = jnp.where(cand, acc, -jnp.inf)
    best_acc = jnp.max(acc)
    keep = acc > acc_frac * best_acc
    rep = jnp.where(keep, best_of_group, -1)
    rep_score = jnp.where(keep, acc, -jnp.inf)
    seen = jnp.full((K + 1,), -jnp.inf).at[
        jnp.where(rep >= 0, rep, K)].max(rep_score)[:K]
    top_s, top_i = _top_k_pad(seen[:K], n_out)
    ids = jnp.where(jnp.isfinite(top_s), top_i, -1).astype(jnp.int32)
    return CandidateResult(ids=ids, scores=top_s)

"""Binary bag-of-words vocabulary: the TPU-native DBoW2.

Covers the reference's `TemplatedVocabulary<FORB::TDescriptor, FORB>`
(Thirdparty/DBoW2/TemplatedVocabulary.h): a k^L hierarchical k-medians tree
over 256-bit ORB descriptors with TF-IDF weights and L1 scoring.  Instead of
loading the shipped ORBvoc.txt (not available here), vocabularies are trained
with `train_vocabulary` on descriptors harvested from any sequence, and
stored as flat arrays:

    node_children [n_nodes, k] i32 (-1 none)
    node_desc     [n_nodes, 32] u8 centroid descriptors
    word_id       [n_nodes] i32 (leaf index, -1 for internal)
    word_weight   [n_words] f32 IDF

`transform` descends the tree with batched Hamming argmins (one [N, k]
popcount-matmul per level — the per-descriptor scalar walk of the reference,
TemplatedVocabulary.h:1217-1259, becomes L gather+matmul steps), and returns
dense L1-normalized TF-IDF BoW vectors, which make vocabulary scoring and
inverted-index candidate search plain vector math over a [K, W] matrix
(replacing KeyFrameDatabase's linked-list inverted file).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Vocabulary:
    k: int
    depth: int
    node_children: np.ndarray   # [n_nodes, k] i32
    node_desc: np.ndarray       # [n_nodes, 32] u8
    word_id: np.ndarray         # [n_nodes] i32
    word_weight: np.ndarray     # [W] f32
    n_words: int
    levels_up: int = 2

    def save(self, path: str):
        np.savez_compressed(path, k=self.k, depth=self.depth,
                            node_children=self.node_children,
                            node_desc=self.node_desc, word_id=self.word_id,
                            word_weight=self.word_weight,
                            n_words=self.n_words, levels_up=self.levels_up)

    @staticmethod
    def load(path: str) -> "Vocabulary":
        z = np.load(path)
        return Vocabulary(k=int(z["k"]), depth=int(z["depth"]),
                          node_children=z["node_children"],
                          node_desc=z["node_desc"], word_id=z["word_id"],
                          word_weight=z["word_weight"],
                          n_words=int(z["n_words"]),
                          levels_up=int(z["levels_up"]))


# ---------------------------------------------------------------------------
# DBoW2 text format (ORBvoc.txt) interchange
# ---------------------------------------------------------------------------

def _native_lib():
    """ctypes handle to native/libvocparser.so, building it on first use if
    a toolchain is present; None when unavailable."""
    import ctypes
    import os
    import subprocess
    global _NATIVE_VOC
    try:
        return _NATIVE_VOC
    except NameError:
        pass
    d = os.path.join(os.path.dirname(__file__), "..", "native")
    so = os.path.join(d, "libvocparser.so")
    if not os.path.exists(so) and os.path.exists(
            os.path.join(d, "voc_parser.cpp")):
        try:
            subprocess.run(["make", "-C", d], capture_output=True,
                           timeout=120, check=True)
        except Exception:
            pass
    lib = None
    if os.path.exists(so):
        try:
            lib = ctypes.CDLL(so)
            lib.voc_text_stats.restype = ctypes.c_int
            lib.voc_text_parse.restype = ctypes.c_long
        except OSError:
            lib = None
    _NATIVE_VOC = lib
    return lib


def _load_orbvoc_native(path: str):
    """(k, L, parents, leaves, descs, weights) via the native parser, or
    None to fall back to Python."""
    import ctypes
    lib = _native_lib()
    if lib is None:
        return None
    k = ctypes.c_long()
    L = ctypes.c_long()
    n = ctypes.c_long()
    if lib.voc_text_stats(path.encode(), ctypes.byref(k), ctypes.byref(L),
                          ctypes.byref(n)) != 0 or n.value <= 0:
        return None
    cap = n.value
    parents = np.empty(cap, np.int32)
    leaves = np.empty(cap, np.uint8)
    descs = np.empty((cap, 32), np.uint8)
    weights = np.empty(cap, np.float32)
    got = lib.voc_text_parse(
        path.encode(),
        parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        leaves.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        descs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap)
    if got <= 0:
        return None
    return (k.value, L.value, parents[:got], leaves[:got].astype(bool),
            descs[:got], weights[:got])


def load_orbvoc_text(path: str, levels_up: int = 4,
                     truncate_depth: Optional[int] = None) -> Vocabulary:
    """Load a DBoW2 text vocabulary (the reference's ORBvoc.txt; format
    written by TemplatedVocabulary::saveToTextFile and parsed at
    TemplatedVocabulary.h:1338-1420):

        k L scoring_type weighting_type
        <parent_id> <is_leaf> <32 descriptor bytes> <weight>   (per node)

    Node ids are implicit (1..n in file order, root = 0).  Word ids are
    assigned to leaves in increasing node-id order (createWords).

    `truncate_depth`: optionally cut the tree at a shallower depth, turning
    depth-`truncate_depth` nodes into words (weights = sum of descendant leaf
    weights).  The shipped ORBvoc is k=10 L=6 (~1M words); the dense-BoW TPU
    formulation wants <= ~10-100k words, so L=4 truncation is the practical
    setting for drop-in use.

    Parsing uses the native mmap tokenizer (native/voc_parser.cpp) when its
    shared library is available — ~100x faster on the 150 MB real ORBvoc —
    with a pure-Python fallback."""
    parsed = _load_orbvoc_native(path)
    if parsed is not None:
        k, L, parents, leaves, descs, weights = parsed
    else:
        with open(path) as f:
            header = f.readline().split()
            k, L = int(header[0]), int(header[1])
            parents, leaves, descs, weights = [], [], [], []
            for line in f:
                parts = line.split()
                if len(parts) < 35:
                    continue
                parents.append(int(parts[0]))
                leaves.append(int(parts[1]))
                descs.append([int(x) for x in parts[2:34]])
                weights.append(float(parts[34]))
    n = len(parents) + 1                      # + root
    parents = np.asarray(parents, np.int32)
    leaves = np.asarray(leaves, bool)
    node_desc = np.zeros((n, 32), np.uint8)
    node_desc[1:] = np.asarray(descs, np.uint8)
    w_all = np.zeros((n,), np.float32)
    w_all[1:] = np.asarray(weights, np.float32)

    node_children = np.full((n, k), -1, np.int32)
    child_count = np.zeros((n,), np.int32)
    for i, p in enumerate(parents, start=1):
        node_children[p, child_count[p]] = i
        child_count[p] += 1

    depth = L
    # word ids: leaves in increasing node-id order
    is_leaf = np.zeros((n,), bool)
    is_leaf[1:] = leaves
    if truncate_depth is not None and truncate_depth < L:
        dep = np.zeros((n,), np.int32)
        for i, p in enumerate(parents, start=1):
            dep[i] = dep[p] + 1
        # accumulate each original leaf's weight up to its cut-depth ancestor
        anc = np.arange(n)
        for _ in range(L - truncate_depth):
            deeper = dep[anc] > truncate_depth
            anc = np.where(deeper, np.concatenate([[0], parents])[anc], anc)
        agg_w = np.zeros((n,), np.float32)
        np.add.at(agg_w, anc[is_leaf], w_all[is_leaf])
        is_leaf = dep == truncate_depth
        node_children[is_leaf] = -1
        w_all = agg_w
        depth = truncate_depth

    word_id = np.full((n,), -1, np.int32)
    leaf_ids = np.nonzero(is_leaf)[0]
    word_id[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int32)
    word_weight = w_all[leaf_ids].astype(np.float32)
    return Vocabulary(k=k, depth=depth, node_children=node_children,
                      node_desc=node_desc, word_id=word_id,
                      word_weight=word_weight, n_words=len(leaf_ids),
                      levels_up=levels_up if depth > levels_up else
                      max(depth - 2, 0))


def save_orbvoc_text(vocab: Vocabulary, path: str) -> None:
    """Write the vocabulary in the DBoW2 text format (readable by the
    reference's loadFromTextFile) — scoring L1_NORM(0), weighting TF_IDF(0)."""
    n = vocab.node_children.shape[0]
    parent = np.zeros((n,), np.int32)
    for p in range(n):
        for c in vocab.node_children[p]:
            if c >= 0:
                parent[c] = p
    with open(path, "w") as f:
        f.write(f"{vocab.k} {vocab.depth} 0 0\n")
        for i in range(1, n):
            leaf = 1 if vocab.word_id[i] >= 0 else 0
            w = (vocab.word_weight[vocab.word_id[i]]
                 if vocab.word_id[i] >= 0 else 0.0)
            bytes_ = " ".join(str(int(b)) for b in vocab.node_desc[i])
            f.write(f"{parent[i]} {leaf} {bytes_} {w}\n")


# ---------------------------------------------------------------------------
# training (host-side numpy; done once per deployment)
# ---------------------------------------------------------------------------

def _unpack(d: np.ndarray) -> np.ndarray:
    return np.unpackbits(d, axis=-1)


def _pack(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits, axis=-1)


def _kmedians_binary(bits: np.ndarray, k: int, rng, iters: int = 8):
    """Binary k-medians with bitwise-majority centroids (the FORB::meanValue
    recipe, Thirdparty/DBoW2/FORB.cpp:40-76).  bits: [N, 256] uint8 0/1."""
    n = bits.shape[0]
    k = min(k, n)
    centers = bits[rng.choice(n, k, replace=False)].astype(np.uint8)
    assign = None
    for _ in range(iters):
        # Hamming distances [N, k]
        d = (bits[:, None, :] != centers[None, :, :]).sum(-1)
        assign = d.argmin(1)
        new_centers = centers.copy()
        for c in range(k):
            sel = bits[assign == c]
            if len(sel):
                new_centers[c] = (sel.mean(0) >= 0.5).astype(np.uint8)
        if (new_centers == centers).all():
            break
        centers = new_centers
    return centers, assign


def train_vocabulary(descriptors: np.ndarray, k: int = 10, depth: int = 4,
                     seed: int = 0, levels_up: int = 2) -> Vocabulary:
    """Build a k^depth tree from packed descriptors [N, 32] u8."""
    rng = np.random.RandomState(seed)
    bits = _unpack(descriptors.astype(np.uint8))

    max_nodes = sum(k ** i for i in range(depth + 1))
    node_children = np.full((max_nodes, k), -1, np.int32)
    node_desc = np.zeros((max_nodes, 32), np.uint8)
    word_id = np.full((max_nodes,), -1, np.int32)

    next_node = [1]
    next_word = [0]
    word_counts = []

    def build(node: int, subset: np.ndarray, level: int):
        if level == depth or len(subset) <= 1:
            word_id[node] = next_word[0]
            next_word[0] += 1
            word_counts.append(len(subset))
            return
        centers, assign = _kmedians_binary(bits[subset], k, rng)
        for c in range(len(centers)):
            child = next_node[0]
            next_node[0] += 1
            node_children[node, c] = child
            node_desc[child] = _pack(centers[c])
            build(child, subset[assign == c], level + 1)

    build(0, np.arange(len(bits)), 0)
    n_nodes = next_node[0]
    n_words = next_word[0]

    # IDF weights (TemplatedVocabulary::setNodeWeights, TF_IDF):
    # wi = log(N / Ni) over the training corpus treated as one document set
    counts = np.asarray(word_counts, np.float64)
    n_docs = max(len(bits), 1)
    weight = np.log(n_docs / np.maximum(counts, 1.0)).astype(np.float32)

    return Vocabulary(k=k, depth=depth,
                      node_children=node_children[:n_nodes],
                      node_desc=node_desc[:n_nodes],
                      word_id=word_id[:n_nodes],
                      word_weight=weight, n_words=n_words,
                      levels_up=levels_up)


# ---------------------------------------------------------------------------
# transform + scoring (jittable)
# ---------------------------------------------------------------------------

def build_transform(vocab: Vocabulary, pad_to: Optional[int] = None):
    """Returns a jittable fn: (desc [N, 32] u8, valid [N]) ->
    (bow [W] f32 L1-normalized TF-IDF, word [N] i32, node_lu [N] i32)
    where node_lu is the tree node `levels_up` above the leaf (the
    FeatureVector grouping key, TemplatedVocabulary.h:1160).

    `pad_to` zero-pads the bow vector to a fixed width: trained trees have
    n_words <= k**depth leaves (unbalanced branches), while the map state
    allocates kf_bow at the k**depth capacity."""
    if pad_to is not None and vocab.n_words > pad_to:
        raise ValueError(
            f"vocabulary has {vocab.n_words} words > pad_to={pad_to}")
    children = jnp.asarray(vocab.node_children)
    ndesc = jnp.asarray(vocab.node_desc)
    wid = jnp.asarray(vocab.word_id)
    weight = jnp.asarray(vocab.word_weight)
    W = vocab.n_words
    k = vocab.k
    depth = vocab.depth
    lu_level = max(depth - vocab.levels_up, 0)

    from orb_slam2_tpu.frontend.orb import unpack_bits, bits_to_pm1

    def transform(desc: jnp.ndarray, valid: jnp.ndarray):
        N = desc.shape[0]
        pm1 = bits_to_pm1(unpack_bits(desc))                 # [N, 256]
        node = jnp.zeros((N,), jnp.int32)
        node_lu = jnp.zeros((N,), jnp.int32)
        for level in range(depth):
            ch = children[node]                              # [N, k]
            ch_ok = ch >= 0
            ch_safe = jnp.clip(ch, 0, None)
            cdesc = ndesc[ch_safe]                           # [N, k, 32]
            cbits = unpack_bits(cdesc.reshape(-1, 32)).reshape(N, k, 256)
            cpm1 = jnp.where(cbits, 1.0, -1.0).astype(jnp.bfloat16)
            dots = jnp.einsum('nb,nkb->nk', pm1, cpm1,
                              preferred_element_type=jnp.float32)
            dots = jnp.where(ch_ok, dots, -1e9)
            best = jnp.argmax(dots, axis=1)
            nxt = jnp.take_along_axis(ch_safe, best[:, None], 1)[:, 0]
            # leaf-less branches keep the current node
            node = jnp.where(jnp.any(ch_ok, 1), nxt, node)
            if level + 1 == lu_level:
                node_lu = node
        word = wid[node]
        word_ok = valid & (word >= 0)
        w_safe = jnp.where(word_ok, word, W)
        bow = jnp.zeros((W + 1,), jnp.float32).at[w_safe].add(
            weight[jnp.clip(word, 0, W - 1)] * word_ok)[:W]
        norm = jnp.sum(jnp.abs(bow))
        bow = bow / jnp.maximum(norm, 1e-12)
        if pad_to is not None and pad_to > W:
            bow = jnp.pad(bow, (0, pad_to - W))
        return bow, jnp.where(word_ok, word, -1), node_lu

    return transform


def l1_score(bow_a: jnp.ndarray, bow_b: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score s = 1 - 0.5 |va - vb|_1 (ScoringObject.cpp:23-68),
    equal to sum min(va, vb) for L1-normalized vectors.  Broadcasts: bow_a
    may be [W] or [K, W], bow_b likewise.

    Computed in the |a-b| form: XLA tiles the subtract+abs+reduce over a
    wide [K, W] matrix ~12x better than minimum+reduce (47 -> 4 ms at
    2048 x 100k)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(bow_a - bow_b), axis=-1)


def shared_words(bow_a: jnp.ndarray, bow_b: jnp.ndarray) -> jnp.ndarray:
    """Count of common words (the reference's inverted-file shared-word
    counting, KeyFrameDatabase.cc:86-104)."""
    return jnp.sum((bow_a > 0) & (bow_b > 0), axis=-1).astype(jnp.int32)

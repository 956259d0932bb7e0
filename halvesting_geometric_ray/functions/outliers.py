"""Embedding-space outlier scoring (isolation forest) and search-result
diversification (maximal marginal relevance) — the two post-embedding
curation utilities a training-data pipeline runs after SemDeDup/kNN:
drop the far-out junk vectors, and de-redundify retrieved exemplars.

Isolation forest (Liu, Ting & Zhou 2008):

- TRAIN on a layout-invariant bounded subsample: the ``sample_size``
  rows with the SMALLEST stable_hash64(vec_id, seed) — a deterministic
  function of row identity, not of block layout — collected to the
  driver (sample_size * dim floats, bounded), then ``n_trees``
  isolation trees grown with a seeded generator.
- SCORE as a stateless broadcast ``map_batches``: trees are dense
  (feature, threshold, left, right, depth-adjust) arrays shipped once
  via ray.put; traversal is vectorized across the batch (one gather
  per level, exactly the multimodal/acscan stepping pattern), giving
  s(x) = 2^(-E[path]/c(sample_size)) — higher = more isolated.

MMR (Carbonell & Goldstein 1998): greedy re-ranking of a BOUNDED
candidate list (the top-N retrieval output) maximizing
lambda * sim(q, d) - (1 - lambda) * max_{s in S} sim(d, s).  The
candidate set is post-reduction driver data by contract (N <= ~1000);
the expensive part — retrieving candidates — stays distributed in
functions/similarity.py.

Reference anchor: the reference scores candidate pairs with a learned
embedding model (modeling_link_prediction.py:93-151); these are the
classical unsupervised companions over the same vector table.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

import ray

from .hashing import stable_hash64
from .similarity import _mat, _norm


def _c_factor(n: int) -> float:
    """Average unsuccessful-search path length of a BST with n rows."""
    if n <= 1:
        return 0.0
    h = np.log(n - 1) + 0.5772156649015329  # harmonic approx
    return 2.0 * h - 2.0 * (n - 1) / n


def _grow_tree(x: np.ndarray, rng: np.random.Generator,
               max_depth: int):
    """Grow one isolation tree; returns dense node arrays
    (feat, thr, left, right, adjust) with adjust = depth + c(leaf_n)
    at leaves (internal nodes carry -1 in adjust)."""
    feat, thr, left, right, adjust = [], [], [], [], []

    def new_node():
        feat.append(-1)
        thr.append(0.0)
        left.append(-1)
        right.append(-1)
        adjust.append(-1.0)
        return len(feat) - 1

    root = new_node()
    stack = [(root, np.arange(len(x)), 0)]
    while stack:
        node, idx, depth = stack.pop()
        sub = x[idx]
        lo, hi = sub.min(axis=0), sub.max(axis=0)
        splittable = np.flatnonzero(hi > lo)
        if depth >= max_depth or len(idx) <= 1 or len(splittable) == 0:
            adjust[node] = depth + _c_factor(len(idx))
            continue
        f = int(rng.choice(splittable))
        t = float(rng.uniform(lo[f], hi[f]))
        m = sub[:, f] < t
        feat[node] = f
        thr[node] = t
        l_, r_ = new_node(), new_node()
        left[node] = l_
        right[node] = r_
        stack.append((l_, idx[m], depth + 1))
        stack.append((r_, idx[~m], depth + 1))
    return (np.array(feat, dtype=np.int32),
            np.array(thr, dtype=np.float64),
            np.array(left, dtype=np.int32),
            np.array(right, dtype=np.int32),
            np.array(adjust, dtype=np.float64))


def isolation_forest_train(embeddings, *, n_trees: int = 64,
                           sample_size: int = 256, seed: int = 7,
                           col: str = "embedding"):
    """Train the forest on the layout-invariant hash subsample.
    Returns (forest_ref, info)."""
    if n_trees < 1 or sample_size < 2:
        raise ValueError("n_trees >= 1 and sample_size >= 2 required")

    def keyed(b: pa.Table) -> pa.Table:
        h = stable_hash64(b.column("vec_id"), seed=seed)
        t = b.append_column("__h", pa.array(h.astype(np.uint64)))
        if len(t) > sample_size:  # per-block pre-prune: k smallest
            keep = np.argpartition(h, sample_size)[:sample_size]
            t = t.take(pa.array(np.sort(keep)))
        return t

    # k-smallest-hash sample: deterministic in content, not layout
    # (per-block prune -> blocks*k rows -> one tiny sort+limit)
    samp = (embeddings.select_columns(["vec_id", col])
            .map_batches(keyed, batch_format="pyarrow",
                         zero_copy_batch=True)
            .sort("__h").limit(sample_size).to_pandas())
    x = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in samp[col]])
    n = len(x)
    max_depth = int(np.ceil(np.log2(max(n, 2))))
    rng = np.random.default_rng(seed)
    trees = [_grow_tree(x, rng, max_depth) for _ in range(n_trees)]
    cn = _c_factor(n)
    info = {"n_sample": n, "max_depth": max_depth, "c_n": cn}
    return ray.put((trees, cn, max_depth)), info


def isolation_forest_scores(embeddings, forest_ref, *,
                            col: str = "embedding",
                            round_to: int = 9):
    """Score every row under the broadcast forest.  Returns
    (vec_id, iso_score) — higher = more isolated (anomalous)."""

    def score(b: pa.Table) -> pa.Table:
        trees, cn, max_depth = ray.get(forest_ref)
        ids, m = _mat(b, col)
        total = np.zeros(len(ids), dtype=np.float64)
        for feat, thr, left, right, adjust in trees:
            node = np.zeros(len(ids), dtype=np.int32)
            # fixed-depth stepping: a leaf keeps its node (is_leaf
            # guard), so max_depth+1 steps land every row on a leaf
            for _ in range(max_depth + 1):
                is_leaf = feat[node] < 0
                f = np.where(is_leaf, 0, feat[node])
                go_left = m[np.arange(len(ids)), f] < thr[node]
                nxt = np.where(go_left, left[node], right[node])
                node = np.where(is_leaf, node, nxt).astype(np.int32)
            # any remaining internal positions: walk out sequentially
            rem = np.flatnonzero(feat[node] >= 0)
            for r in rem:
                nd = node[r]
                while feat[nd] >= 0:
                    nd = left[nd] if m[r, feat[nd]] < thr[nd] \
                        else right[nd]
                node[r] = nd
            total += adjust[node]
        avg = total / len(trees)
        s = np.power(2.0, -avg / cn)
        return pa.table({"vec_id": pa.array(ids),
                         "iso_score": pa.array(np.round(s, round_to),
                                               type=pa.float64())})

    return embeddings.select_columns(["vec_id", col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=4096)


def mmr_diversify(query_vec: np.ndarray, cand_ids: np.ndarray,
                  cand_mat: np.ndarray, *, k: int = 10,
                  lam: float = 0.7) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy MMR selection over a bounded candidate set (driver-side
    by contract — candidates are a top-N retrieval output).  Returns
    (selected_ids, mmr_scores) in selection order; ties break on
    smaller id.  sim = cosine."""
    if not (0.0 <= lam <= 1.0):
        raise ValueError("lam must be in [0, 1]")
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    c = _norm(np.asarray(cand_mat, dtype=np.float64))
    rel = c @ q
    n = len(cand_ids)
    k = min(k, n)
    selected = []
    scores = []
    max_sim = np.full(n, -np.inf)
    active = np.ones(n, dtype=bool)
    for step in range(k):
        if step == 0:
            mmr = lam * rel
        else:
            mmr = lam * rel - (1.0 - lam) * max_sim
        mmr_masked = np.where(active, mmr, -np.inf)
        best = np.lexsort((cand_ids, -mmr_masked))[0]
        selected.append(best)
        scores.append(float(mmr_masked[best]))
        active[best] = False
        max_sim = np.maximum(max_sim, c @ c[best])
    return (np.asarray(cand_ids)[selected],
            np.asarray(scores, dtype=np.float64))

"""Distributed SGNS (word2vec / node2vec) embedding training.

The reference learns node embeddings with torch embedding tables
trained by SGD over sampled links (reference link_prediction.py:33-106;
halvesting_geometric/models/modeling_link_prediction.py:115-143).  This
module is the Ray-Data-first counterpart over the engine's OWN
certified training-data path (node2vec walks -> skipgram_pairs ->
Mikolov noise negatives): per-shard sequential minibatch SGD epochs
folded by example-weighted model averaging.

Execution model (one epoch):

- pairs are hash-partitioned by occurrence identity (stable hash of
  ``id_cols`` mod ``num_parts``) and sorted by identity WITHIN the
  shard — shard content and row order are partitioning-invariant;
- (W_in, W_out) are broadcast ONCE via ray.put; each shard task copies
  only the embedding rows it touches, draws this epoch's negatives
  from the count^power noise CDF with the same stateless-hash
  inverse-CDF draw ``skipgram_negatives`` certifies (per-occurrence:
  the hash covers id_cols + epoch + slot), runs sequential minibatch
  SGD over its rows, and emits SPARSE per-row weight deltas;
- the driver folds ``W += sum_s(n_s * delta_s) / sum_s(n_s)``
  (example-weighted parameter averaging) — one vocab-bounded exchange
  per epoch; the pair stream itself never lands on the driver.

Determinism: init, sharding, in-shard order, negative draws and update
order are all pure functions of (data, hyperparameters, seed);
tests/test_word2vec.py pins a pure-NumPy sequential replay at
allclose 1e-6 and partitioning invariance.  Driver/broadcast state is
O(vocab x dim) — the bound word2vec itself assumes for its tables.
Minibatch math runs in float64 (weights stored float32 between
epochs) so the replay tolerance is rounding-, not order-, limited.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pyarrow as pa

import ray

from ..ops._util import pre_shuffle
from .hashing import stable_hash_cols64

_PART = "__part"


def _noise_table(vocab_counts, power: float):
    """(sorted tokens, cumulative noise CDF) from a (token, n) table —
    identical construction to functions/pack.py::skipgram_negatives."""
    import pandas as pd

    vc = vocab_counts.to_pandas() if hasattr(vocab_counts, "to_pandas") \
        else pd.DataFrame(vocab_counts)
    if not len(vc):
        raise ValueError("vocab_counts is empty")
    toks = vc["token"].to_numpy().astype(np.int64)
    w = vc["n"].to_numpy().astype(np.float64) ** power
    order = np.argsort(toks, kind="stable")
    toks, w = toks[order], w[order]
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    return toks, cdf


def _slot_uniform(base: np.ndarray, salt: int) -> np.ndarray:
    """One U[0,1) per row for a given slot salt — the exact splitmix
    slot mix of skipgram_negatives (functions/pack.py)."""
    with np.errstate(over="ignore"):
        h = (base.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + np.uint64(salt * 2 + 1))
        h ^= h >> np.uint64(31)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
    return (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53


def sgns_init(n_tokens: int, dim: int, seed: int
              ) -> Tuple[np.ndarray, np.ndarray]:
    """word2vec init: W_in ~ U(-0.5, 0.5)/dim, W_out = 0 (float32)."""
    rng = np.random.default_rng(seed)
    w_in = ((rng.random((n_tokens, dim)) - 0.5) / dim).astype(np.float32)
    w_out = np.zeros((n_tokens, dim), dtype=np.float32)
    return w_in, w_out


def sgns_shard_epoch(w_in: np.ndarray, w_out: np.ndarray,
                     toks: np.ndarray, cdf: np.ndarray,
                     ids: Sequence[np.ndarray], cen: np.ndarray,
                     ctx: np.ndarray, *, negatives: int, lr: float,
                     inner_batch: int, seed: int, epoch: int
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One shard's sequential epoch; pure NumPy (the same routine runs
    inside the Ray group task AND backs the replay oracle — the
    DISTRIBUTION semantics under test are sharding + broadcast +
    averaging, this is the per-shard math they compose).

    Returns (uniq global rows, delta_in, delta_out) in float64."""
    order = np.lexsort(tuple(np.asarray(i) for i in reversed(list(ids))))
    ids_s = [np.asarray(i)[order] for i in ids]
    cen = np.asarray(cen)[order]
    ctx = np.asarray(ctx)[order]
    base = stable_hash_cols64(ids_s, seed=seed + 7919 * (epoch + 1))
    n = len(cen)
    ci = np.searchsorted(toks, cen)
    oi = np.searchsorted(toks, ctx)
    negs = np.empty((n, negatives), dtype=np.int64)
    for slot in range(negatives):
        u = _slot_uniform(base, slot)
        negs[:, slot] = np.minimum(
            np.searchsorted(cdf, u, side="right"), toks.size - 1)
    uniq = np.unique(np.concatenate([ci, oi, negs.ravel()]))
    l_in = w_in[uniq].astype(np.float64)
    l_out = w_out[uniq].astype(np.float64)
    lc = np.searchsorted(uniq, ci)
    tgt = np.concatenate(
        [np.searchsorted(uniq, oi)[:, None],
         np.searchsorted(uniq, negs)], axis=1)  # n x (1+neg)
    lab = np.zeros(negatives + 1, dtype=np.float64)
    lab[0] = 1.0
    dim = l_in.shape[1]
    for s in range(0, n, inner_batch):
        e = min(s + inner_batch, n)
        h = l_in[lc[s:e]]                         # b x d
        v = l_out[tgt[s:e]]                       # b x (1+neg) x d
        sco = 1.0 / (1.0 + np.exp(-np.einsum("bd,bkd->bk", h, v)))
        g = lr * (lab[None, :] - sco)             # b x (1+neg)
        np.add.at(l_in, lc[s:e], np.einsum("bk,bkd->bd", g, v))
        np.add.at(l_out, tgt[s:e].reshape(-1),
                  np.einsum("bk,bd->bkd", g, h).reshape(-1, dim))
    return uniq, l_in - w_in[uniq], l_out - w_out[uniq]


@ray.remote(num_cpus=0)
class _SgnsShardActor:
    """Holds its parts' (ids, center, context) arrays resident across
    epochs — the pair set shards ONCE (one grouped exchange total);
    each epoch is then just one actor call per pool member + the
    driver's vocab-bounded fold.  (The first cut re-ran the
    repartition+sort every epoch: at 2M pairs / 32 CPUs that was ~26 s
    of exchange per ~0.7 s of SGD.)"""

    def __init__(self, paths: Dict[int, str], idc, center_col,
                 context_col, noise):
        # `noise` / `wref` arrive as top-level ObjectRef args, which
        # Ray auto-resolves before the call (fetched once per node)
        import pyarrow.parquet as pq

        self.toks, self.cdf = noise
        self.parts = []
        for p in sorted(paths):
            t = pq.read_table(paths[p])
            if t.num_rows == 0:
                continue
            ids = [t.column(c).to_numpy(zero_copy_only=False)
                   .astype(np.int64) for c in idc]
            cen = t.column(center_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            ctx = t.column(context_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            self.parts.append((ids, cen, ctx))

    def train(self, ep: int, wref, negatives: int, lr: float,
              inner_batch: int, seed: int):
        """One epoch over every owned part (each part is its own SGD
        shard, exactly as the grouped formulation).  Returns per-part
        (uniq_rows, delta_in, delta_out, n_pairs) tuples."""
        wi, wo = wref
        out = []
        for ids, cen, ctx in self.parts:
            uniq, d_in, d_out = sgns_shard_epoch(
                wi, wo, self.toks, self.cdf, ids, cen, ctx,
                negatives=negatives, lr=lr, inner_batch=inner_batch,
                seed=seed, epoch=ep)
            out.append((uniq, d_in, d_out, len(cen)))
        return out


def sgns_train(pairs, vocab_counts, *,
               id_cols: Sequence[str] = ("walk_id", "step", "offset"),
               center_col: str = "center", context_col: str = "context",
               dim: int = 32, negatives: int = 5, power: float = 0.75,
               lr: float = 0.025, epochs: int = 3, seed: int = 1,
               num_parts: int = 16, inner_batch: int = 64,
               workdir: str = None
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Dict]:
    """Train SGNS embeddings over a skip-gram pair Dataset.

    pairs: Dataset with id_cols (unique occurrence identity — e.g.
    skipgram_pairs(keep_order=True)'s (walk_id, step, offset)) +
    center/context token columns.  vocab_counts: (token:int64, n:int64)
    — every center/context token MUST appear in it (validated in the
    pre-shard map stage, before any retryable group task).

    workdir: directory for the one-time pair-shard parquet layer (a
    fresh subdirectory is created per call).  On a multi-node cluster
    pass a SHARED path (the engine-wide workdir contract, same as the
    CSR shards); default is a process-local temp dir (single node).

    Returns (tokens sorted, w_in (V, dim) float32, w_out, info);
    w_in is the embedding table (w_out the context table, as word2vec).
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    if negatives < 1:
        raise ValueError("negatives must be >= 1")
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    if inner_batch < 1:
        raise ValueError("inner_batch must be >= 1")
    if lr <= 0:
        raise ValueError("lr must be > 0")
    if power <= 0:
        raise ValueError("power must be > 0")
    idc = list(id_cols)
    if len(idc) < 1:
        raise ValueError("id_cols must name at least one column")
    toks, cdf = _noise_table(vocab_counts, power)
    if np.unique(toks).size != toks.size:
        raise ValueError("vocab_counts has duplicate tokens")
    v_size = toks.size
    noise_ref = ray.put((toks, cdf))

    def tag(b: pa.Table) -> pa.Table:
        tt, _ = ray.get(noise_ref)
        for col in (center_col, context_col):
            v = b.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
            j = np.minimum(np.searchsorted(tt, v), tt.size - 1)
            if (tt[j] != v).any():
                raise ValueError(
                    f"{col} contains tokens missing from vocab_counts")
        h = stable_hash_cols64([b.column(c) for c in idc], seed=seed + 101)
        return b.append_column(
            _PART, pa.array((h % num_parts).astype(np.int32)))

    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..graph.engine import plan_actors

    cols = idc + [center_col, context_col]
    tagged = pairs.select_columns(cols).map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True)

    # shard ONCE: one grouped exchange writes per-part parquet; every
    # epoch after that is actor calls + the driver fold (the first cut
    # re-ran the repartition+sort each epoch — pure exchange waste)
    if workdir is None:
        shard_root = tempfile.mkdtemp(prefix="sgns_shards_")
        _cleanup = True
    else:
        shard_root = os.path.join(workdir, "sgns_shards")
        shutil.rmtree(shard_root, ignore_errors=True)
        os.makedirs(shard_root, exist_ok=True)
        _cleanup = False

    def write_part(g: pa.Table) -> pa.Table:
        p = int(g.column(_PART)[0].as_py())
        path = os.path.join(shard_root, f"part-{p:05d}.parquet")
        tmp = f"{path}.tmp{os.getpid()}"
        pq.write_table(g.drop_columns([_PART]), tmp)
        os.replace(tmp, path)
        return pa.table({"part": pa.array([p], type=pa.int64()),
                         "n": pa.array([g.num_rows], type=pa.int64())})

    manifest = (pre_shuffle(tagged).groupby(_PART)
                .map_groups(write_part, batch_format="pyarrow")
                .to_pandas())
    n_total = int(manifest["n"].sum()) if len(manifest) else 0
    if n_total == 0:
        raise ValueError("pairs is empty")
    paths = {int(p): os.path.join(shard_root, f"part-{int(p):05d}.parquet")
             for p in manifest["part"]}

    try:
        existing = sorted(paths)
        owned = plan_actors(len(existing), min(len(existing), 32))
        actors = [_SgnsShardActor.remote(
            {existing[j]: paths[existing[j]] for j in grp},
            idc, center_col, context_col, noise_ref)
            for grp in owned]

        w_in, w_out = sgns_init(v_size, dim, seed)
        info: Dict = {"V": int(v_size), "dim": dim,
                      "n_pairs": int(n_total), "epochs": []}
        for ep in range(epochs):
            wref = ray.put((w_in, w_out))
            res = ray.get([a.train.remote(ep, wref, negatives, lr,
                                          inner_batch, seed)
                           for a in actors])
            acc = np.zeros((2, v_size, dim), dtype=np.float64)
            moved = 0.0
            for shard_list in res:
                for uniq, d_in, d_out, n in shard_list:
                    acc[0, uniq] += d_in * n
                    acc[1, uniq] += d_out * n
                    moved += float((np.abs(d_in).sum()
                                    + np.abs(d_out).sum()) * n)
            w_in = (w_in.astype(np.float64) + acc[0] / n_total).astype(
                np.float32)
            w_out = (w_out.astype(np.float64)
                     + acc[1] / n_total).astype(np.float32)
            info["epochs"].append(
                {"epoch": ep,
                 "mean_abs_update": moved / (n_total * dim)})
            del wref
        for a in actors:
            ray.kill(a)
    finally:
        if _cleanup:
            shutil.rmtree(shard_root, ignore_errors=True)
    return toks, w_in, w_out, info


def embeddings_dataset(tokens: np.ndarray, w: np.ndarray, *,
                       id_col: str = "vec_id", col: str = "embedding",
                       num_blocks: int = 16):
    """Wrap a trained (V, d) matrix as an embeddings Dataset with the
    same (vec_id, embedding fixed_size_list<float>) shape as the
    testdata embeddings table — feeds kmeans / semantic_dedup /
    knn_* unchanged.  Driver holds the vocab-bounded matrix (the SGNS
    contract); repartitioned so downstream stages parallelize."""
    import ray.data as rd

    w32 = np.ascontiguousarray(np.asarray(w, dtype=np.float32))
    t = pa.table({
        id_col: pa.array(np.asarray(tokens, dtype=np.int64)),
        col: pa.FixedSizeListArray.from_arrays(
            pa.array(w32.ravel(), type=pa.float32()), w32.shape[1]),
    })
    return rd.from_arrow(t).repartition(num_blocks)

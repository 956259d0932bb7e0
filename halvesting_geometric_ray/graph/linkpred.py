"""End-to-end link-prediction evaluation — the reference's purpose.

Reference anchor: /root/reference/link_prediction.py:33-106 trains a GNN
link predictor over a RandomLinkSplit of the citation graph
(link_prediction_datamodule.py:127-134, negative ratio 2.0) and reports
ROC-AUC over held-out positive edges vs sampled non-edges.  This module
is the same evaluation protocol re-expressed with the engine's own
certified stages and a deterministic, published scorer (node2vec /
SGNS embeddings, Grover & Leskovec 2016; Mikolov et al. 2013):

    split_edges (hash split, order-independent)            graph/splits.py
      -> node2vec walks over the TRAIN graph only          graph/node2vec.py
      -> skip-gram pairs                                   functions/pack.py
      -> distributed SGNS (replay-oracle parity-pinned)    functions/word2vec.py
      -> dot-product scores on test positives + non-edges  (this module)
      -> exact Mann-Whitney ROC-AUC                        ops/stats.py

Scale shape: every stage is the already-certified distributed operator;
this module adds only the scoring pass.  The trained table is
vocab-bounded ((V, dim) float32 — the SGNS driver contract), broadcast
ONCE via ray.put and indexed per batch with searchsorted; past driver
memory, materialize `embeddings_dataset` to a layer and replace the
lookup with two bucketed `ops.join.hash_join`s (the q_host_graph
decoration pattern).  Scores are rounded so `roc_auc`'s grouped exchange
stays bounded by distinct score values, per its docstring contract.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray

from ..config import DEFAULT, EngineConfig

_SCORE_DECIMALS = 6


def _score_pairs(labeled, toks: np.ndarray, w: np.ndarray,
                 decimals: int = _SCORE_DECIMALS):
    """dot(emb[src], emb[dst]) per row.  `toks` must be sorted
    (sgns_train's contract); vids absent from the vocabulary get the
    zero vector (score contribution 0) — with default walk starts every
    vertex appears, so this is a guard, not a data path."""
    if toks.size and not (np.diff(toks) > 0).all():
        raise ValueError("toks must be strictly sorted")
    wref = ray.put((toks, np.ascontiguousarray(w, dtype=np.float32)))

    def score(b: pa.Table) -> pa.Table:
        tk, mat = ray.get(wref)
        out = np.zeros(b.num_rows, dtype=np.float64)
        if b.num_rows and tk.size:
            s = b.column("src").to_numpy()
            d = b.column("dst").to_numpy()
            es = np.zeros((b.num_rows, mat.shape[1]), dtype=np.float32)
            ed = np.zeros_like(es)
            for v, e in ((s, es), (d, ed)):
                ix = np.searchsorted(tk, v)
                ok = (ix < tk.size) & (tk[np.minimum(ix, tk.size - 1)] == v)
                e[ok] = mat[ix[ok]]
            out = np.round((es.astype(np.float64)
                            * ed.astype(np.float64)).sum(axis=1), decimals)
        return pa.table({"src": b.column("src"), "dst": b.column("dst"),
                         "lab": b.column("lab"),
                         "score": pa.array(out, type=pa.float64())})

    return labeled.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)


def _with_label(ds, lab: int):
    def add(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b.column("src").cast(pa.int64()),
            "dst": b.column("dst").cast(pa.int64()),
            "lab": pa.array(np.full(b.num_rows, lab, dtype=np.int64))})

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def link_prediction_auc(edges, offsets: np.ndarray, workdir: str,
                        cfg: EngineConfig = DEFAULT, *,
                        test_frac: float = 0.2, neg_ratio: float = 2.0,
                        seed: int = 17, dim: int = 16, epochs: int = 2,
                        negatives: int = 3, lr: float = 0.05,
                        p: float = 1.0, q: float = 1.0,
                        walk_len: int = 8, walks_per_vertex: int = 1,
                        window: int = 2, num_parts: int = 16,
                        num_actors: int = 0
                        ) -> Tuple[float, "object", Dict]:
    """Hold out `test_frac` of the edges, train node2vec/SGNS embeddings
    on the remaining train graph, score test positives against
    `neg_ratio` x as many sampled true non-edges by embedding dot
    product, and return (auc, scored Dataset(src, dst, lab, score),
    info).

    Deterministic end to end: the split is a pure edge-hash, walks and
    SGNS are stateless-hash / replay-pinned, negatives are seeded
    non-edges — the AUC is bitwise independent of partitioning and
    actor layout.  `neg_ratio` defaults to the reference's 2.0
    (link_prediction_datamodule.py:127-134); AUC is rank-based, so the
    ratio shifts variance, not the expected value.
    """
    if not 0.0 < test_frac < 1.0:
        raise ValueError("test_frac must be in (0, 1)")
    if neg_ratio <= 0:
        raise ValueError("neg_ratio must be > 0")
    from ..functions.pack import skipgram_pairs
    from ..functions.word2vec import sgns_train
    from ..ops.agg import grouped_aggregate
    from ..ops.stats import roc_auc
    from .node2vec import node2vec_walks
    from .splits import negative_sample, split_edges

    n_vertices = int(offsets[-1])
    split = split_edges(edges, {"train": 1.0 - test_frac,
                                "test": test_frac}, seed=seed)
    split = split.materialize()  # one split pass feeds both filters
    train = split.filter(expr="split == 'train'").drop_columns(["split"])
    test = split.filter(expr="split == 'test'").drop_columns(["split"])
    n_test = test.count()
    if n_test == 0:
        raise ValueError("test split is empty; raise test_frac or use "
                         "a larger edge table")

    train_wd = os.path.join(workdir, f"linkpred_s{seed}")
    walks, winfo = node2vec_walks(
        train, offsets, train_wd, cfg, p=p, q=q, walk_len=walk_len,
        walks_per_vertex=walks_per_vertex, seed=seed + 1,
        num_actors=num_actors)
    walks = walks.materialize()  # feeds vocab counts AND pairs
    pairs = skipgram_pairs(walks, "walk_id", "step", "vid",
                           window=window, keep_order=True,
                           num_parts=num_parts)
    vocab = grouped_aggregate(walks.select_columns(["vid"]), ["vid"],
                              {"n": ("count", None)})
    vt = pa.concat_tables(
        [pa.table({"token": b.column("vid"), "n": b.column("n")})
         for b in vocab.iter_batches(batch_format="pyarrow")])
    toks, w_in, _, tinfo = sgns_train(
        pairs, vt, id_cols=("walk_id", "step", "offset"), dim=dim,
        negatives=negatives, lr=lr, epochs=epochs, seed=seed + 2,
        num_parts=num_parts)

    n_neg = max(1, int(round(neg_ratio * n_test)))
    # negatives anti-join against ALL edges (train + test): a sampled
    # pair must be a true non-edge, exactly as RandomLinkSplit draws.
    neg = negative_sample(edges, n_vertices, n_neg, seed=seed + 3,
                          cfg=cfg)
    labeled = _with_label(test, 1).union(_with_label(neg, 0))
    scored = _score_pairs(labeled, toks, w_in).materialize()
    auc = roc_auc(scored, "score", "lab")
    info = {"auc": auc, "n_test": int(n_test),
            "n_neg": int(scored.count() - n_test),
            "n_train": int(split.count() - n_test),
            "dim": dim, "epochs": epochs, "seed": seed,
            "walks": winfo, "sgns": {k: v for k, v in tinfo.items()
                                     if k != "epochs"},
            "tokens": toks, "w_in": w_in}
    return auc, scored, info

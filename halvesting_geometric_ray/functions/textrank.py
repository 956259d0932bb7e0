"""TextRank keyword extraction — PageRank over the token
co-occurrence graph (Mihalcea & Tarau, EMNLP 2004).

The capstone that ties the text surface to the graph engine: tokens
become vertices, unordered within-window co-occurrences become
weighted undirected edges (weight = exact co-occurrence count), and
the score is the engine's own weighted PageRank
(graph/pagerank.py::pagerank, weight_col mode) — the identical
shard-actor gather-scatter the link graph uses, so every scale
property (per-destination-combined exchange, checkpointing, resume)
is inherited rather than re-implemented.  The reference's analogue is
its metadata keyword/title passes feeding the citation graph
(reference link_prediction_metadata.py:128-191); TextRank is the
standard unsupervised replacement a 100-TB curation pipeline runs per
shard.

Tokenization is the repo-wide single-space-split SQL-parity
convention (functions/collocations.py::_batch_tokens), and pair
canonicalization is lexicographic least/greatest — the co-occurrence
table is exactly the PMI pair table at min_count=1.

Scale shape: pair generation is the vectorized shifted-view pass from
collocations (in-batch combiner, ONE grouped-sum exchange); the token
vocabulary gets dense ids via the hash partitioner
(ops/ids.py::assign_dense_ids_hash — no driver vocab); the graph is
vocabulary-bounded (|V| = distinct tokens, |E| <= distinct pairs), so
the PageRank stage is small relative to the corpus scan.  Nothing
materializes per-document state on the driver.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

from ..config import DEFAULT, EngineConfig
from ..ops.agg import grouped_aggregate
from ..ops.ids import assign_dense_ids_hash
from ..ops.join import hash_join
from .collocations import _batch_tokens

_I64 = pa.int64()
_STR = pa.string()


def cooccurrence_pairs(docs, text_col: str = "text", window: int = 2,
                       cfg: EngineConfig = DEFAULT):
    """-> Dataset (a, b, n:int64): exact windowed unordered
    co-occurrence counts, a < b lexicographically."""
    import polars as pl

    if window < 1:
        raise ValueError("window must be >= 1")

    def pair_partials(b: pa.Table) -> pa.Table:
        toks, docs_ix = _batch_tokens(b, text_col)
        outs_a, outs_b = [], []
        for k in range(1, window + 1):
            if len(toks) <= k:
                break
            x, y = toks[:-k], toks[k:]
            m = (docs_ix[:-k] == docs_ix[k:]) & (x != y)
            if not m.any():
                continue
            xa, ya = x[m], y[m]
            outs_a.append(np.where(xa < ya, xa, ya))
            outs_b.append(np.where(xa < ya, ya, xa))
        if not outs_a:
            return pa.table({"a": pa.array([], type=_STR),
                             "b": pa.array([], type=_STR),
                             "n": pa.array([], type=_I64)})
        df = pl.DataFrame({"a": np.concatenate(outs_a).astype(str),
                           "b": np.concatenate(outs_b).astype(str)})
        out = df.group_by(["a", "b"]).len(name="n").sort(["a", "b"])
        return out.to_arrow().cast(pa.schema([
            pa.field("a", _STR), pa.field("b", _STR), pa.field("n", _I64)]))

    partial = docs.map_batches(pair_partials, batch_format="pyarrow",
                               zero_copy_batch=True)
    return grouped_aggregate(partial, ["a", "b"], {"n": ("sum", "n")},
                             num_parts=cfg.num_parts)


def textrank_keywords(docs, workdir: str, text_col: str = "text",
                      window: int = 2, cfg: EngineConfig = DEFAULT, *,
                      damping: float = 0.85, tol: float = 1e-6,
                      max_iters: int = 100,
                      round_to: Optional[int] = 9) -> Tuple["object", dict]:
    """Run TextRank over ``docs``.  Returns (scores_ds, info):
    scores_ds has columns (token, rank) over every token with >= 1
    within-window co-occurrence (isolated tokens carry no edges and no
    rank, by TextRank convention); info is the pagerank info dict plus
    graph cardinalities.  ``round_to`` quantizes ranks for
    layout-stable comparison (None = raw)."""
    from ..graph.pagerank import pagerank

    pairs = cooccurrence_pairs(docs, text_col, window, cfg).materialize()

    # token vertex ids from the pair endpoints (vocabulary-bounded)
    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table({"token": pa.concat_arrays(
            [b.column("a").combine_chunks().cast(_STR),
             b.column("b").combine_chunks().cast(_STR)])})

    toks = pairs.map_batches(endpoints, batch_format="pyarrow",
                             zero_copy_batch=True)
    ids, offsets = assign_dense_ids_hash(toks, "token", cfg.num_parts)
    ids = ids.materialize()

    id_schema = pa.schema([pa.field("vid", _I64), pa.field("token", _STR)])
    p_schema = pa.schema([pa.field("a", _STR), pa.field("b", _STR),
                          pa.field("n", _I64)])
    j = hash_join(pairs, ids.select_columns(["token", "vid"]),
                  on="a", right_on="token", num_parts=cfg.num_parts,
                  left_schema=p_schema, right_schema=id_schema)
    j = j.map_batches(lambda b: b.rename_columns(["a", "b", "n", "src"]),
                      batch_format="pyarrow", zero_copy_batch=True)
    j_schema = pa.schema([pa.field("a", _STR), pa.field("b", _STR),
                          pa.field("n", _I64), pa.field("src", _I64)])
    j = hash_join(j, ids.select_columns(["token", "vid"]),
                  on="b", right_on="token", num_parts=cfg.num_parts,
                  left_schema=j_schema, right_schema=id_schema)

    # undirected graph: emit both directions with the count weight
    def sym(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("vid").to_numpy()
        w = b.column("n").to_numpy().astype(np.float64)
        return pa.table({"src": pa.array(np.concatenate([s, d]), type=_I64),
                         "dst": pa.array(np.concatenate([d, s]), type=_I64),
                         "w": pa.array(np.concatenate([w, w]),
                                       type=pa.float64())})

    edges = j.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)

    ranks, info = pagerank(edges, offsets, workdir, cfg, job="textrank",
                           damping=damping, tol=tol, max_iters=max_iters,
                           weight_col="w",
                           lineage={"kind": "textrank", "window": window})

    r_schema = pa.schema([pa.field("vid", _I64),
                          pa.field("rank", pa.float64())])
    out = hash_join(ranks.select_columns(["vid", "rank"]),
                    ids.select_columns(["token", "vid"]),
                    on="vid", right_on="vid", num_parts=cfg.num_parts,
                    left_schema=r_schema, right_schema=id_schema)

    def fin(b: pa.Table) -> pa.Table:
        r = b.column("rank").to_numpy()
        if round_to is not None:
            r = np.round(r, round_to)
        return pa.table({"token": b.column("token"),
                         "rank": pa.array(r, type=pa.float64())})

    out = out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)
    info = dict(info)
    info["n_tokens"] = int(offsets[-1])
    return out, info

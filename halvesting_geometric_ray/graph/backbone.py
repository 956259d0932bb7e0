"""Multiscale backbone extraction: the disparity filter.

Serrano, Boguna & Vespignani 2009 ("Extracting the multiscale
backbone of complex weighted networks") — THE standard denoiser for
weighted graphs like host graphs: for a vertex i of (out-)degree
k_i and strength s_i = sum of its edge weights, the null model
spreads s_i uniformly at random over k_i edges; the probability that
one edge would carry a normalized weight >= w_ij / s_i by chance is

    p_ij = (1 - w_ij / s_i) ^ (k_i - 1)

An edge is significant at level ``alpha`` when p_ij < alpha from at
least one of its endpoints; the backbone keeps exactly the
significant edges.  Degree-1 vertices can never certify their single
edge (p = (1-1)^0 = 1), per the paper.

``mode="undirected"`` operates on the paper's object — the
UNDIRECTED simple graph: reciprocal (u, v)/(v, u) input rows are
folded to canonical (min, max) pairs with summed weights before any
degree/strength statistics, and the output has one row per
undirected edge (src < dst except self-loops).

Plan shape: one grouped (count, sum) aggregate per direction + one
bucketed hash_join per direction + a vectorized pow — no driver
state, no iteration.  ``mode="directed"`` scores each edge from its
source side only (one aggregate + one join); ``mode="undirected"``
scores from both endpoint sides over the symmetrized weights and
keeps min(p_src, p_dst) (two joins), the paper's setting.

Semantic anchor: the reference's citation-network edges are already
curated; on raw web host graphs (graph/hostgraph.py) almost every
pair of big hosts shares at least one link — the disparity filter is
the principled way to keep the structurally meaningful ones.
q_host_backbone_disparity certifies p-values hash-exact against a
DuckDB pow() oracle at the gate.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..config import DEFAULT, EngineConfig

_I64, _F64 = pa.int64(), pa.float64()


def disparity_filter(edges, cfg: EngineConfig = DEFAULT, *,
                     src_col: str = "src", dst_col: str = "dst",
                     weight_col: str = "w", alpha: float = 0.05,
                     mode: str = "directed",
                     num_parts: Optional[int] = None):
    """Per-edge disparity p-values + backbone membership.

    Returns ds(src, dst, w, p, keep) where ``p`` is the null-model
    p-value (min over the scored sides) and ``keep`` = p < alpha.
    Input edge weights must be positive; duplicate (src, dst) rows are
    the caller's contract (host graphs are pre-folded).
    """
    import pyarrow.compute as pc

    from ..ops.agg import grouped_aggregate
    from ..ops.join import hash_join

    if mode not in ("directed", "undirected"):
        raise ValueError(f"unknown mode {mode!r}")
    np_ = num_parts or cfg.num_parts

    def canon(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b.column(src_col).cast(_I64),
            "dst": b.column(dst_col).cast(_I64),
            "w": b.column(weight_col).cast(_F64)})

    # e feeds the stats aggregate AND the scoring join (twice in
    # undirected mode) — materialize once or every reference re-runs
    # the caller's upstream plan (host_graph's joins, typically)
    e = edges.map_batches(canon, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    if mode == "undirected":
        # FOLD to the undirected simple graph first (the paper's
        # object): reciprocal (u,v)/(v,u) rows canonicalize to
        # (min, max) and SUM their weights — without this fold,
        # reciprocal pairs double k, split w across two rows, and the
        # two orientations can get inconsistent keep decisions.
        def canonical(b: pa.Table) -> pa.Table:
            s = b.column("src").to_numpy()
            d = b.column("dst").to_numpy()
            return pa.table({
                "src": pa.array(np.minimum(s, d)),
                "dst": pa.array(np.maximum(s, d)),
                "w": b.column("w")})

        e = grouped_aggregate(
            e.map_batches(canonical, batch_format="pyarrow",
                          zero_copy_batch=True),
            ["src", "dst"], {"w": ("sum", "w")},
            num_parts=np_).materialize()
        # endpoint incidence: each folded edge once per endpoint
        # (self-loops once)
        def swapped_nonself(b: pa.Table) -> pa.Table:
            t = b.filter(pc.not_equal(b.column("src"),
                                      b.column("dst")))
            return pa.table({"src": t.column("dst"),
                             "dst": t.column("src"),
                             "w": t.column("w")})

        both = e.union(e.map_batches(
            swapped_nonself, batch_format="pyarrow",
            zero_copy_batch=True))
    else:
        both = e
    stats = grouped_aggregate(
        both.select_columns(["src", "w"]), ["src"],
        {"k": ("count", "w"), "s": ("sum", "w")}, num_parts=np_)
    if mode == "undirected":
        stats = stats.materialize()  # referenced by both side joins

    e_schema = pa.schema([("src", _I64), ("dst", _I64), ("w", _F64)])
    st_schema = pa.schema([("src", _I64), ("k", _I64), ("s", _F64)])
    j = hash_join(e, stats, on="src", right_on="src", num_parts=np_,
                  left_schema=e_schema, right_schema=st_schema)

    def pval(k: np.ndarray, s: np.ndarray, w: np.ndarray) -> np.ndarray:
        # (1 - w/s)^(k-1); 0^0 = 1 for the degree-1 case, matching
        # DuckDB pow()
        base = 1.0 - w / s
        return np.power(base, (k - 1).astype(np.float64))

    if mode == "directed":
        def score(b: pa.Table) -> pa.Table:
            w = b.column("w").to_numpy()
            p = pval(b.column("k").to_numpy(),
                     b.column("s").to_numpy(), w)
            return pa.table({
                "src": b.column("src"), "dst": b.column("dst"),
                "w": b.column("w"), "p": pa.array(p),
                "keep": pa.array(p < alpha)})

        return j.map_batches(score, batch_format="pyarrow",
                             zero_copy_batch=True)

    # undirected: second side — join dst stats, p = min(p_src, p_dst)
    def psrc(b: pa.Table) -> pa.Table:
        w = b.column("w").to_numpy()
        p = pval(b.column("k").to_numpy(), b.column("s").to_numpy(), w)
        return pa.table({"dst": b.column("dst"),
                         "src": b.column("src"),
                         "w": b.column("w"), "p_src": pa.array(p)})

    j1 = j.map_batches(psrc, batch_format="pyarrow",
                       zero_copy_batch=True)
    j1_schema = pa.schema([("dst", _I64), ("src", _I64), ("w", _F64),
                           ("p_src", _F64)])
    st2 = stats.map_batches(
        lambda b: pa.table({"vid": b.column("src"),
                            "k2": b.column("k"), "s2": b.column("s")}),
        batch_format="pyarrow", zero_copy_batch=True)
    st2_schema = pa.schema([("vid", _I64), ("k2", _I64), ("s2", _F64)])
    j2 = hash_join(j1, st2, on="dst", right_on="vid", num_parts=np_,
                   left_schema=j1_schema, right_schema=st2_schema)

    def score2(b: pa.Table) -> pa.Table:
        w = b.column("w").to_numpy()
        p2 = pval(b.column("k2").to_numpy(),
                  b.column("s2").to_numpy(), w)
        p = np.minimum(b.column("p_src").to_numpy(), p2)
        return pa.table({
            "src": b.column("src"), "dst": b.column("dst"),
            "w": b.column("w"), "p": pa.array(p),
            "keep": pa.array(p < alpha)})

    return j2.map_batches(score2, batch_format="pyarrow",
                          zero_copy_batch=True)

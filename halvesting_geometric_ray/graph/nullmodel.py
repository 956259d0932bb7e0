"""Configuration-model null graph: degree-preserving random rewiring —
the null hypothesis behind every "is this structure surprising?"
question (motif significance, community strength, rich-club
normalization).  Holding each edge's SOURCE fixed and permuting the
DESTINATION column uniformly preserves every out-degree exactly and
the in-degree multiset exactly; what changes is WHO points at whom.

Deterministic distributed permutation (no driver RNG sequence, no
O(E) driver state): give every edge two independent stable hashes; the
rank of an edge under hash-1 defines its position in the source
stream, the rank under hash-2 its position in the destination stream;
zipping the two streams by position pairs each source with a
uniformly-drawn destination.  Ranks are computed by range-partitioning
the (uniform) hash domain — per-part sort + zip-index + tiny per-part
counts to the driver for prefix offsets — and the zip is one bucketed
join on position.  Layout-invariant: both ranks are functions of edge
content + seed only.

Self-loops and parallel edges may appear (the standard configuration
model admits them; at web-graph sparsity their expected share is
O(d_max/m)).  Downstream exact counters canonicalize + dedup, which is
the usual "simple-graph projection" convention — stated, not hidden.

Reference anchor: the reference's negative sampling draws random
non-edges per batch (link_prediction_datamodule.py:127-134); this is
the global-graph analogue — a full random graph with the SAME degree
sequence.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa

from ..config import DEFAULT, EngineConfig
from ..functions.hashing import stable_hash_pair64
from ..ops._util import pre_shuffle
from ..ops.agg import grouped_aggregate
from ..ops.join import hash_join

_H_SPAN = 1 << 63  # stable hashes are non-negative 63-bit ints


def _rank_by_hash(edges, keep: str, seed: int, num_parts: int):
    """(pos, keep) with pos = 0-based rank of the edge's content hash
    (unique w.h.p.).  Range-partition the uniform hash domain, sort +
    zip-index per part, driver prefix offsets (num_parts ints)."""
    import polars as pl

    span = _H_SPAN // num_parts + 1

    def keyed(b: pa.Table) -> pa.Table:
        h = stable_hash_pair64(b.column("src"), b.column("dst"),
                               seed=seed)
        return pa.table({"h": pa.array(h, type=pa.int64()),
                         keep: b.column(keep),
                         "__rp": pa.array((h // span).astype(np.int32))})

    def local_rank(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g).sort("h")
        df = df.with_columns(pl.int_range(0, pl.len(),
                                          dtype=pl.Int64).alias("lr"))
        return df.to_arrow().cast(pa.schema(
            list(g.schema) + [pa.field("lr", pa.int64())]))

    ranked = (pre_shuffle(edges.map_batches(
        keyed, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("__rp")
        .map_groups(local_rank, batch_format="pyarrow",
                    retry_exceptions=True).materialize())
    tot = grouped_aggregate(ranked.select_columns(["__rp"]), ["__rp"],
                            {"n": ("count", None)},
                            num_parts=4).to_pandas()
    sizes = np.zeros(num_parts, dtype=np.int64)
    if len(tot):
        sizes[tot["__rp"].to_numpy()] = tot["n"].to_numpy()
    off = np.zeros(num_parts + 1, dtype=np.int64)
    np.cumsum(sizes, out=off[1:])

    def fin(b: pa.Table) -> pa.Table:
        p = b.column("__rp").to_numpy()
        pos = b.column("lr").to_numpy() + off[p]
        return pa.table({"pos": pa.array(pos, type=pa.int64()),
                         keep: b.column(keep)})

    return ranked.map_batches(fin, batch_format="pyarrow",
                              zero_copy_batch=True)


def rewire_configuration(edges, cfg: EngineConfig = DEFAULT, *,
                         seed: int = 29):
    """Returns a rewired edge Dataset (src, dst) with out-degrees
    preserved exactly and the in-degree multiset preserved exactly."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    sid = _rank_by_hash(edges, "src", seed, cfg.num_parts)
    did = _rank_by_hash(edges, "dst", seed + 7919, cfg.num_parts)
    j = hash_join(sid, did, on="pos", right_on="pos",
                  right_cols=["dst"], num_parts=cfg.num_parts,
                  left_schema=pa.schema([pa.field("pos", pa.int64()),
                                         pa.field("src", pa.int64())]),
                  right_schema=pa.schema([pa.field("pos", pa.int64()),
                                          pa.field("dst", pa.int64())]))
    return j.map_batches(
        lambda b: pa.table({"src": b.column("src"),
                            "dst": b.column("dst")}),
        batch_format="pyarrow", zero_copy_batch=True)


def motif_significance(edges, cfg: EngineConfig = DEFAULT, *,
                       seed: int = 29) -> Dict:
    """Triangle count of the real graph vs its configuration-model
    rewiring (simple-graph projection on both sides).  Returns
    {n_triangles, n_triangles_null, ratio} — ratio >> 1 is the
    clustering signature no degree sequence explains."""
    from .triangles import triangles_edges

    _p, real = triangles_edges(edges, cfg)
    null_edges = rewire_configuration(edges, cfg, seed=seed)
    _pn, null = triangles_edges(null_edges, cfg)
    return {"n_triangles": int(real), "n_triangles_null": int(null),
            "ratio": round(real / max(null, 1), 6)}

"""Matching-based graph coarsening — the multilevel contraction step.

Contract every matched pair of graph/matching.py into one supervertex
(the standard multilevel preprocessing of METIS-family partitioners
and multilevel community detection: match, contract, solve coarse,
project back).  Composes with the engine's other primitives:
maximal_matching supplies the pairing, ldg_partition / louvain run on
the coarse graph, and the returned vertex->super mapping projects
coarse results back to the fine graph.

Semantics
---------
- supervertex id = min(vid, partner) for a matched pair, vid itself
  for unmatched vertices (sparse ids from the fine vid space — feed
  ops/ids.assign_dense_ids downstream when a dense 0..N'-1 space is
  needed, e.g. before building coarse CSR shards).
- edge (u, v, w) becomes (super(u), super(v), w); parallel edges SUM
  weights (multigraph folds into weights, the louvain contraction
  convention); a pair's internal edge becomes a self-loop row
  (su == sv) carrying its weight, so TOTAL weight is conserved —
  callers that want a simple coarse graph filter self-loops out.

Scale shape
-----------
The mapping is one row per fine vertex.  Below ``broadcast_cap`` it
ships once via ray.put and the relabel is two map-side lookups; past
the cap the relabel is two bucketed hash_joins (the q_host_graph
discipline — never an unbounded driver materialization: the cap path
collects the mapping on the driver ONLY after counting it).  The
contraction itself is one grouped-sum exchange keyed on the coarse
pair.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..ops.agg import grouped_aggregate
from ..ops.join import broadcast_lookup, hash_join


def matching_to_mapping(matching) -> "rd.Dataset":
    """(vid, partner) -> (vid, super) with super = min(vid, partner)
    for matched vertices, vid for unmatched (partner == -1)."""

    def to_super(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy(zero_copy_only=False)
        pr = b.column("partner").to_numpy(zero_copy_only=False)
        sup = np.where(pr >= 0, np.minimum(vid, pr), vid)
        return pa.table({"vid": b.column("vid"),
                         "super": pa.array(sup, type=pa.int64())})

    return matching.map_batches(to_super, batch_format="pyarrow",
                                zero_copy_batch=True)


def coarsen_by_matching(
        edges, matching, cfg: EngineConfig = DEFAULT, *,
        weight_col: Optional[str] = None,
        broadcast_cap: int = 20_000_000,
        num_parts: Optional[int] = None
) -> Tuple["rd.Dataset", "rd.Dataset", Dict]:
    """Contract matched pairs.  Returns (coarse_edges(src, dst, w),
    mapping(vid, super), info).  coarse_edges sums parallel-edge
    weights and KEEPS self-loop rows (weight conservation); unweighted
    input counts each edge as w=1."""
    num_parts = num_parts or cfg.num_parts
    mapping = matching_to_mapping(matching).materialize()
    n_fine = mapping.count()

    i64 = pa.int64()
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    e = edges.select_columns(cols)
    if not weight_col:
        e = e.map_batches(
            lambda b: b.append_column(
                "w", pa.array(np.ones(b.num_rows), type=pa.float64())),
            batch_format="pyarrow", zero_copy_batch=True)
    elif weight_col != "w":
        e = e.map_batches(
            lambda b: b.rename_columns(
                ["w" if c == weight_col else c for c in b.column_names]),
            batch_format="pyarrow", zero_copy_batch=True)

    if n_fine <= broadcast_cap:
        mtbl = pa.concat_tables(
            list(mapping.iter_batches(batch_format="pyarrow")))
        src_map = pa.table({"vid": mtbl.column("vid"),
                            "su": mtbl.column("super")})
        dst_map = pa.table({"vid": mtbl.column("vid"),
                            "sv": mtbl.column("super")})
        relabeled = broadcast_lookup(e, "src", src_map, "vid", ["su"])
        relabeled = broadcast_lookup(relabeled, "dst", dst_map, "vid",
                                     ["sv"])
    else:
        e_schema = pa.schema([("src", i64), ("dst", i64),
                              ("w", pa.float64())])
        m_schema = pa.schema([("vid", i64), ("super", i64)])
        relabeled = hash_join(e, mapping, on="src", right_on="vid",
                              right_cols=["super"], num_parts=num_parts,
                              left_schema=e_schema, right_schema=m_schema)
        relabeled = relabeled.map_batches(
            lambda b: b.rename_columns(
                ["su" if c == "super" else c for c in b.column_names]),
            batch_format="pyarrow", zero_copy_batch=True)
        relabeled = hash_join(
            relabeled, mapping, on="dst", right_on="vid",
            right_cols=["super"], num_parts=num_parts,
            left_schema=pa.schema([("src", i64), ("dst", i64),
                                   ("w", pa.float64()), ("su", i64)]),
            right_schema=m_schema)
        relabeled = relabeled.map_batches(
            lambda b: b.rename_columns(
                ["sv" if c == "super" else c for c in b.column_names]),
            batch_format="pyarrow", zero_copy_batch=True)

    pairs = relabeled.map_batches(
        lambda b: pa.table({"src": b.column("su"), "dst": b.column("sv"),
                            "w": b.column("w")}),
        batch_format="pyarrow", zero_copy_batch=True)
    coarse = grouped_aggregate(pairs, ["src", "dst"],
                               {"w": ("sum", "w")}, num_parts=num_parts)

    n_pairs = int(matching.map_batches(
        lambda b: pa.table({"n": pa.array([int(
            (b.column("partner").to_numpy(zero_copy_only=False) >= 0)
            .sum())])}),
        batch_format="pyarrow", zero_copy_batch=True)
        .sum("n")) // 2
    info = {"n_fine": int(n_fine),
            "n_coarse": int(n_fine - n_pairs),
            "n_matched_pairs": n_pairs}
    return coarse, mapping, info

"""k-truss extraction: iterated triangle-support peeling.

The k-truss is the maximal subgraph in which every EDGE participates in
at least k-2 triangles (of the subgraph) — the edge-cohesion analogue
of the k-core vertex filter (graph/kcore.py) and a sharper spam/nav-ring
detector: boilerplate link rings have high degree but few closed
triangles, so they survive cores and fall out of trusses.

Algorithm (Cohen, "Graph twiddling in a MapReduce world", 2009 — the
iterated-recompute formulation, which is the shuffle-friendly one):

  E <- canonical undirected simple edge set
  repeat:  support(e) = number of triangles of (V, E) containing e;
           E <- {e : support(e) >= k-2}
  until no edge is dropped.

Each round reuses the degree-oriented wedge/semi-join triangle plan
(graph/triangles.py): wedges are generated from the lower-rank corner
(skew-bounded fan-out), closed with a bucketed semi-join, and each
triangle (a, b, u) explodes into its three canonical edges for ONE
grouped count — so a round costs one triangle pass, and the number of
rounds is the peeling depth (small on web graphs; each round must drop
>= 1 edge or the loop exits).  Monotone deletion => the fixpoint is the
exact k-truss regardless of partitioning (tests/test_truss.py pins a
single-process peeling oracle and layout invariance).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pyarrow as pa

from ..config import DEFAULT, EngineConfig
from ..ops.agg import grouped_aggregate
from ..ops.join import hash_join
from .triangles import canonical_undirected, orient, _wedges

_EDGE_SCHEMA = pa.schema([pa.field("src", pa.int64()),
                          pa.field("dst", pa.int64())])


def _edge_support(und, cfg: EngineConfig):
    """Per-edge triangle count over a canonical undirected table (und
    must be materialized).  Returns ds(src, dst, support) — edges in no
    triangle are ABSENT (support 0)."""
    oriented = orient(und, cfg).materialize()
    o = oriented.select_columns(["src", "dst"])
    w = _wedges(oriented, cfg)
    w_schema = pa.schema([pa.field("a", pa.int64()),
                          pa.field("b", pa.int64()),
                          pa.field("u", pa.int64())])
    tri = hash_join(w, o, on=["a", "b"], right_on=["src", "dst"],
                    join_type="semi", num_parts=cfg.num_parts,
                    left_schema=w_schema, right_schema=_EDGE_SCHEMA)

    def edges3(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy()
        bb = b.column("b").to_numpy()
        u = b.column("u").to_numpy()
        # wedge corners satisfy a < b (triu expansion over rank-sorted
        # neighbors is not vid-sorted) — canonicalize all three edges
        s = np.concatenate([np.minimum(u, a), np.minimum(u, bb),
                            np.minimum(a, bb)])
        d = np.concatenate([np.maximum(u, a), np.maximum(u, bb),
                            np.maximum(a, bb)])
        return pa.table({"src": pa.array(s), "dst": pa.array(d)})

    return grouped_aggregate(
        tri.map_batches(edges3, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["src", "dst"], {"support": ("count", None)},
        num_parts=cfg.num_parts)


def k_truss(edges, k: int, cfg: EngineConfig = DEFAULT, *,
            max_rounds: int = 0) -> Tuple["object", Dict]:
    """k-truss of a DIRECTED edge table (canonicalized internally).
    Returns (ds(src, dst, support), info): the surviving canonical
    undirected edges with their in-truss triangle support (>= k-2).
    k >= 3 (the 2-truss is the input edge set itself)."""
    if k < 3:
        raise ValueError(f"k_truss needs k >= 3, got {k}")
    need = k - 2
    und = canonical_undirected(edges, cfg).materialize()
    n_edges = und.count()
    info: Dict = {"k": k, "rounds": []}
    rounds = 0
    while True:
        rounds += 1
        sup = _edge_support(und, cfg)

        def keep(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(pc.greater_equal(b.column("support"), need))

        survivors = sup.map_batches(keep, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
        n_kept = survivors.count()
        info["rounds"].append({"round": rounds, "edges_in": int(n_edges),
                               "edges_out": int(n_kept)})
        if n_kept == n_edges:
            und = survivors
            break
        und = survivors.select_columns(["src", "dst"]).materialize()
        n_edges = n_kept
        if n_kept == 0:
            und = survivors
            break
        if max_rounds and rounds >= max_rounds:
            info["truncated"] = True
            und = survivors
            break
    info["num_rounds"] = rounds
    info["n_edges"] = int(n_edges)
    return und, info

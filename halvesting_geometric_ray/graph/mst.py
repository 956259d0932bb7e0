"""Minimum spanning forest — distributed Boruvka over the edge Dataset.

Boruvka's method is the parallel-native MST algorithm: every component
picks its lightest incident edge, the chosen edges merge components
(the chosen pseudoforest contracts by pointer jumping), and surviving
inter-component edges replay the round — O(log V) rounds, each a fixed
number of bucketed exchanges over the SHRINKING live-edge table
(intra-component edges are dropped the moment their endpoints merge,
so round cost tracks the remaining frontier, never E).

Tie-breaking: edges carry the lexicographic total order (w, u, v), so
every component's minimum is unique and the output is THE unique MSF
of the perturbed weights (the classic distinct-weight argument).  The
result is therefore an exact, partitioning-invariant edge SET,
certified against a sequential Kruskal oracle using the same order
(tests/test_mst.py).

Reference anchor: the reference has no MST; this completes the
engine's iterative graph family (SURVEY.md section 2.8) with the
remaining textbook distributed-graph primitive (Boruvka 1926; the
canonical "pick-min + hash-min contraction" workload of the
MapReduce-MST literature, cf. Lattanzi et al., "Filtering: a method
for solving graph problems in MapReduce", SPAA 2011).

Scale shape (per round): one keep_min_by exchange over 2x the live
edges (per-batch local winners collapse mass before it moves), two
bucketed hash joins to relabel endpoints, and pointer jumping over the
component-parent table (<= #components rows, at least halving each
round).  Driver state is scalar counts only; chosen tree edges
accumulate as materialized object-store blocks, never on the driver.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..ops.dedup import distinct, keep_min_by
from ..ops.join import hash_join

_MSF_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                         ("w", pa.float64())])


def _canonical_weighted(edges, src: str, dst: str, weight_col: Optional[str],
                        num_parts: int):
    """(src,dst[,w]) -> undirected canonical (u<v, no self-loops), the
    MINIMUM-weight representative per parallel-edge group.  Missing
    weight_col means unweighted (w=1.0: any spanning forest is minimal;
    the (w,u,v) order still makes the output unique)."""

    def canon(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        if weight_col is not None:
            w = b.column(weight_col).to_numpy(
                zero_copy_only=False).astype(np.float64)
        else:
            w = np.ones(len(s), dtype=np.float64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        keep = u != v
        return pa.table({"u": pa.array(u[keep]), "v": pa.array(v[keep]),
                         "w": pa.array(w[keep])})

    e = edges.map_batches(canon, batch_format="pyarrow",
                          zero_copy_batch=True)
    return keep_min_by(e, ["u", "v"], "w", num_parts=num_parts)


def _resolve_roots(chosen, num_parts: int, max_jumps: int = 64):
    """Chosen-edge pseudoforest on component ids -> (c, root) map.

    Every live component points at the other endpoint of its chosen
    edge; because the (w,u,v) order is total, each tree of the chosen
    graph contains exactly one 2-cycle (the mutually-minimal pair).
    Round 0 breaks it (the SMALLER endpoint becomes its own root);
    subsequent rounds pointer-jump p <- p[p] until no pointer moves —
    O(log chain) joins over the <= #components-row table."""

    def parent(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False)
        cu = b.column("cu").to_numpy(zero_copy_only=False)
        cv = b.column("cv").to_numpy(zero_copy_only=False)
        p = np.where(c == cu, cv, cu)
        return pa.table({"c": pa.array(c), "p": pa.array(p)})

    P = chosen.map_batches(parent, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    def as_map(t):  # (c, p) -> (c2, p2) lookup side
        return t.map_batches(
            lambda b: b.rename_columns(["c2", "p2"]),
            batch_format="pyarrow", zero_copy_batch=True)

    for jump in range(max_jumps):
        J = hash_join(P, as_map(P), on="p", right_on="c2",
                      right_cols=["p2"], num_parts=num_parts,
                      left_schema=pa.schema([("c", pa.int64()),
                                             ("p", pa.int64())]),
                      right_schema=pa.schema([("c2", pa.int64()),
                                              ("p2", pa.int64())]))

        if jump == 0:
            def step(b: pa.Table) -> pa.Table:
                c = b.column("c").to_numpy(zero_copy_only=False)
                p = b.column("p").to_numpy(zero_copy_only=False)
                pp = b.column("p2").to_numpy(zero_copy_only=False)
                new = np.where((pp == c) & (c < p), c, p)
                return pa.table({"c": pa.array(c), "p": pa.array(new),
                                 "chg": pa.array((new != p).astype(np.int64))})
        else:
            def step(b: pa.Table) -> pa.Table:
                c = b.column("c").to_numpy(zero_copy_only=False)
                p = b.column("p").to_numpy(zero_copy_only=False)
                pp = b.column("p2").to_numpy(zero_copy_only=False)
                return pa.table({"c": pa.array(c), "p": pa.array(pp),
                                 "chg": pa.array((pp != p).astype(np.int64))})

        stepped = J.map_batches(step, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
        changed = stepped.sum("chg") or 0
        P = stepped.drop_columns(["chg"]).materialize()
        if jump > 0 and changed == 0:
            break
    return P  # (c, p=root)


def _resolve_roots_np(chosen_tbl: pa.Table, max_jumps: int = 64
                      ) -> pa.Table:
    """Driver fast path of _resolve_roots: identical math (2-cycle
    break then pointer jumping) over numpy arrays.  One row per live
    component (<= #components, shrinking every round), int64 columns
    only — used below the driver_root_cap, the same regime split as
    Louvain's contraction (graph/louvain.py small_edge_cap)."""
    c = chosen_tbl.column("c").to_numpy(zero_copy_only=False)
    cu = chosen_tbl.column("cu").to_numpy(zero_copy_only=False)
    cv = chosen_tbl.column("cv").to_numpy(zero_copy_only=False)
    p = np.where(c == cu, cv, cu)
    order = np.argsort(c, kind="stable")
    cs, ps = c[order], p[order]
    # jump 0: break the unique 2-cycle per tree (smaller endpoint roots)
    pp = ps[np.searchsorted(cs, ps)]
    ps = np.where((pp == cs) & (cs < ps), cs, ps)
    for _ in range(max_jumps):
        pp = ps[np.searchsorted(cs, ps)]
        if (pp == ps).all():
            break
        ps = pp
    return pa.table({"c": pa.array(cs), "p": pa.array(ps)})


def minimum_spanning_forest(
        edges, *, src: str = "src", dst: str = "dst",
        weight_col: Optional[str] = None, num_parts: int = 16,
        max_rounds: int = 64,
        driver_root_cap: int = 32_000_000) -> Tuple[rd.Dataset, Dict]:
    """Exact minimum spanning forest of the undirected(ified) graph.

    Returns ``(msf(u, v, w), info)`` — one row per tree edge of the
    unique (w,u,v)-lexicographic MSF; ``info`` carries rounds,
    n_vertices, n_tree_edges, n_components and total_weight.  Self
    loops are dropped; parallel edges collapse to their minimum-weight
    representative; direction is ignored (u<v canonical form).
    """
    e0 = _canonical_weighted(edges, src, dst, weight_col, num_parts)

    def init_c(b: pa.Table) -> pa.Table:
        return pa.table({"cu": b.column("u"), "cv": b.column("v"),
                         "u": b.column("u"), "v": b.column("v"),
                         "w": b.column("w")})

    e = e0.map_batches(init_c, batch_format="pyarrow",
                       zero_copy_batch=True).materialize()

    # vertex universe from the RAW endpoints (a self-loop contributes
    # its vertex even though the edge itself can never be a tree edge)
    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table({"vid": pa.concat_arrays(
            [b.column(src).combine_chunks().cast(pa.int64()),
             b.column(dst).combine_chunks().cast(pa.int64())])})

    n_vertices = int(distinct(
        edges.map_batches(endpoints, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["vid"], num_parts=num_parts).count())

    e_schema = pa.schema([("cu", pa.int64()), ("cv", pa.int64()),
                          ("u", pa.int64()), ("v", pa.int64()),
                          ("w", pa.float64())])
    msf_parts = []
    rounds = 0
    while rounds < max_rounds and e.count() > 0:
        rounds += 1

        # per-component lightest incident edge, both endpoint views
        def cands(b: pa.Table) -> pa.Table:
            cu = b.column("cu").combine_chunks()
            cv = b.column("cv").combine_chunks()
            both = {"c": pa.concat_arrays([cu.cast(pa.int64()),
                                           cv.cast(pa.int64())])}
            for col in ("cu", "cv", "u", "v", "w"):
                a = b.column(col).combine_chunks()
                both[col] = pa.concat_arrays([a, a])
            return pa.table(both)

        chosen = keep_min_by(
            e.map_batches(cands, batch_format="pyarrow",
                          zero_copy_batch=True),
            ["c"], ["w", "u", "v"], num_parts=num_parts).materialize()

        # tree edges this round (an edge may win for both endpoints)
        msf_parts.append(distinct(chosen, ["u", "v"],
                                  select=["u", "v", "w"],
                                  num_parts=num_parts).materialize())

        # contract: component -> root of its chosen-edge tree.  One
        # row per live component; below the cap the fold runs on the
        # driver (3 int64 arrays) and the relabel is a broadcast —
        # past it, the distributed join path (identical math).
        if chosen.count() <= driver_root_cap:
            roots_tbl = _resolve_roots_np(pa.concat_tables(
                list(chosen.select_columns(["c", "cu", "cv"])
                     .iter_batches(batch_format="pyarrow"))))
            from ..ops.join import broadcast_lookup

            relabeled = broadcast_lookup(e, "cu", roots_tbl, "c", ["p"])
            relabeled = broadcast_lookup(
                relabeled, "cv", roots_tbl.rename_columns(["c", "q"]),
                "c", ["q"])
        else:
            roots = _resolve_roots(chosen, num_parts)  # (c, p)
            relabeled = hash_join(
                hash_join(e, roots, on="cu", right_on="c",
                          right_cols=["p"], num_parts=num_parts,
                          left_schema=e_schema,
                          right_schema=pa.schema([("c", pa.int64()),
                                                  ("p", pa.int64())])),
                roots.map_batches(
                    lambda b: b.rename_columns(["c", "q"]),
                    batch_format="pyarrow", zero_copy_batch=True),
                on="cv", right_on="c", right_cols=["q"],
                num_parts=num_parts,
                left_schema=e_schema.append(pa.field("p", pa.int64())),
                right_schema=pa.schema([("c", pa.int64()),
                                        ("q", pa.int64())]))

        def apply_labels(b: pa.Table) -> pa.Table:
            cu = b.column("p").to_numpy(zero_copy_only=False)
            cv = b.column("q").to_numpy(zero_copy_only=False)
            keep = cu != cv
            return pa.table({"cu": pa.array(cu[keep]),
                             "cv": pa.array(cv[keep]),
                             "u": b.column("u").filter(pa.array(keep)),
                             "v": b.column("v").filter(pa.array(keep)),
                             "w": b.column("w").filter(pa.array(keep))})

        e = relabeled.map_batches(apply_labels, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

    if msf_parts:
        msf = msf_parts[0]
        for part in msf_parts[1:]:
            msf = msf.union(part)
        msf = msf.materialize()
        n_tree = int(msf.count())
        total_w = float(msf.sum("w") or 0.0)
    else:
        msf = rd.from_arrow(pa.table({"u": pa.array([], type=pa.int64()),
                                      "v": pa.array([], type=pa.int64()),
                                      "w": pa.array([], type=pa.float64())}))
        n_tree, total_w = 0, 0.0

    info = {"rounds": rounds, "n_vertices": n_vertices,
            "n_tree_edges": n_tree,
            "n_components": n_vertices - n_tree,
            "total_weight": total_w}
    return msf, info

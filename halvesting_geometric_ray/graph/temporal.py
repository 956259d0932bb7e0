"""Time-respecting (temporal) reachability: earliest-arrival times
over a timestamped edge table — the crawl-frontier question "starting
from these seeds at t0, what could a crawler that follows links only
FORWARD in time have discovered, and when?".

Semantics (Pan & Saramaki 2011; Wu et al. 2014 VLDB "Path problems in
temporal graphs"): an edge (u, v, ts) is traversable iff
ts >= arrival(u); then arrival(v) <= ts.  earliest_arrival computes
the least fixpoint by label-correcting rounds:

    round: frontier (changed vertices) JOIN edges on src ->
           keep ts >= arrival(src) -> grouped min per dst ->
           compare against current arrivals -> changed set

Each round is one bucketed frontier-edge join + one grouped min + one
bounded merge — never a full-graph scan of arrival state; rounds are
bounded by the longest time-respecting shortest-path chain (<= the
temporal diameter).  Monotonicity (labels only decrease, traversal
threshold only loosens as labels decrease) guarantees convergence to
the unique least fixpoint regardless of round batching, which is what
makes the result layout- and schedule-invariant.

SQL-certifiable: the same fixpoint is the recursive closure
  walk(v, t) = seeds UNION step(walk) with step filtering ts >= t,
  then min(t) per v
— exactly the q_temporal_reach oracle.

Reference anchor: the reference filters citations by publication year
(link_prediction_metadata.py:373-377) — a static cut of time; this is
the full temporal-path semantics over the same timestamped data.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..ops.agg import grouped_aggregate
from ..ops.join import hash_join


def earliest_arrival(edges, seeds: Sequence[Tuple[object, int]], *,
                     src_col: str = "src", dst_col: str = "dst",
                     ts_col: str = "ts",
                     cfg: EngineConfig = DEFAULT,
                     max_rounds: int = 64):
    """Least-fixpoint earliest arrival.  ``seeds`` is a bounded list of
    (vertex, start_time) pairs (driver-side by contract — the seed set
    of a crawl).  Returns (arrival_ds, info) with arrival_ds =
    (v, arrival) over every temporally reachable vertex and info
    carrying per-round changed counts."""
    if not seeds:
        raise ValueError("seeds must be non-empty")
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")

    edges = edges.map_batches(
        lambda b: pa.table({"s": b.column(src_col),
                            "d": b.column(dst_col),
                            "ts": b.column(ts_col).cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    key_type = edges.schema().base_schema.field("s").type

    # duplicate seed vertices min-merge up front (one row per vertex)
    seed_min: dict = {}
    for sv, st in seeds:
        st = int(st)
        if sv not in seed_min or st < seed_min[sv]:
            seed_min[sv] = st
    seed_tbl = pa.table({
        "v": pa.array(list(seed_min), type=key_type),
        "t": pa.array(list(seed_min.values()), type=pa.int64())})
    arrival = rd.from_arrow(seed_tbl).materialize()
    frontier = arrival
    e_schema = pa.schema([pa.field("s", key_type),
                          pa.field("d", key_type),
                          pa.field("ts", pa.int64())])
    a_schema = pa.schema([pa.field("v", key_type),
                          pa.field("t", pa.int64())])
    info: Dict = {"rounds": 0, "changed": []}

    for _ in range(max_rounds):
        # frontier-restricted scatter: edges whose src changed
        j = hash_join(edges, frontier, on="s", right_on="v",
                      right_cols=["t"], num_parts=cfg.num_parts,
                      left_schema=e_schema, right_schema=a_schema)

        def relax(b: pa.Table) -> pa.Table:
            ts = b.column("ts").to_numpy()
            t0 = b.column("t").to_numpy()
            keep = ts >= t0
            return pa.table({"v": b.column("d").filter(pa.array(keep)),
                             "tc": pa.array(ts[keep], type=pa.int64())})

        cand = grouped_aggregate(
            j.map_batches(relax, batch_format="pyarrow",
                          zero_copy_batch=True),
            ["v"], {"tc": ("min", "tc")}, num_parts=cfg.num_parts)

        # changed = candidates strictly improving (or new) arrivals
        c_schema = pa.schema([pa.field("v", key_type),
                              pa.field("tc", pa.int64())])
        cmp = hash_join(cand, arrival, on="v", right_on="v",
                        right_cols=["t"], join_type="left",
                        num_parts=cfg.num_parts, left_schema=c_schema,
                        right_schema=a_schema)

        def pick(b: pa.Table) -> pa.Table:
            tc = b.column("tc")
            told = b.column("t")
            better = pc.or_kleene(pc.is_null(told),
                                  pc.less(tc, told))
            better = pc.fill_null(better, True)
            t = b.filter(better)
            return pa.table({"v": t.column("v"),
                             "t": t.column("tc")})

        changed = cmp.map_batches(pick, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
        n_changed = changed.count()
        info["rounds"] += 1
        info["changed"].append(int(n_changed))
        if n_changed == 0:
            break
        # merge: min over old ∪ changed (changed rows strictly win on
        # their keys; others pass through)
        arrival = grouped_aggregate(
            arrival.union(changed), ["v"], {"t": ("min", "t")},
            num_parts=cfg.num_parts).materialize()
        frontier = changed

    return arrival.map_batches(
        lambda b: pa.table({"v": b.column("v"),
                            "arrival": b.column("t")}),
        batch_format="pyarrow", zero_copy_batch=True), info

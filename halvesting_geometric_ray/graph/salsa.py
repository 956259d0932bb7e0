"""SALSA — Stochastic Approach for Link-Structure Analysis (Lempel &
Moran, WWW 2000): the degree-normalized alternative to HITS, computed
in its CLOSED FORM rather than by power iteration.

Lempel & Moran's central theorem: the authority Markov chain (step
backward along an in-link, then forward along one of that hub's
out-links) has, within each connected component C of the bipartite
hub/authority support graph, the stationary distribution

    pi(a) = indeg(a) / sum_{a' in C} indeg(a')

and the hub chain symmetrically with out-degrees.  With the standard
reducibility treatment (each component weighted by its share of the
side's nodes), the global scores are

    authority(v) = (|A ∩ C| * indeg(v)) / (|A| * m_C)
    hub(u)       = (|H ∩ C| * outdeg(u)) / (|H| * m_C)

where A / H are the sets of vertices with indeg / outdeg > 0, C is
v's (u's) bipartite component and m_C its edge count (note
sum-of-indegs = sum-of-outdegs = m_C within a component, since every
bipartite edge contributes to both sides).

So SALSA NEEDS NO ITERATION — it composes from already-certified
primitives: one connected-components run over the bipartite support
graph (hub-role and authority-role of the same vertex are distinct
bipartite nodes: vid 2u vs 2v+1) plus degree counts, grouped sums and
bucketed joins.  At 10^12-page scale that is one CC job (the pointer-
jumping engine, graph/components.py) and three grouped exchanges —
ideal versus power iteration, and exact rather than converged.

Numerator and denominator are exact int64 products (< 2^53 at any
realistic scale per component) and the score is ONE double division,
so results are bitwise identical to any other evaluation order — the
discipline that lets q_salsa_urls carry a DuckDB check-exact oracle.

Self-loops are dropped (a page "endorsing itself" carries no SALSA
signal, the reference convention for co-citation in graph/metrics.py);
parallel edges collapse to the distinct edge set first.

Reference anchor: the citation-graph analytics family the reference
builds on its HAL link graph (link_prediction_dataset.py:50-75);
Lempel & Moran 2000 sections 3-4 for the closed form.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..ops.agg import grouped_aggregate
from ..ops.dedup import distinct
from ..ops.join import hash_join


def salsa(edges, offsets: np.ndarray, workdir: str,
          cfg: EngineConfig = DEFAULT) -> Tuple["rd.Dataset", Dict]:
    """Closed-form SALSA over a directed (src, dst) vid edge table.

    Returns ``(ds(vid, authority, hub), info)`` — one row per vertex
    that participates in at least one role; authority (hub) is 0.0 and
    omitted-by-absence for vertices with no in-links (out-links), so
    callers left-join against their vertex table and coalesce.
    """
    n = int(offsets[-1])
    num_parts = len(offsets) - 1

    e = distinct(
        edges.filter(expr="src != dst").select_columns(["src", "dst"]),
        ["src", "dst"], num_parts=cfg.num_parts)
    e = e.materialize()  # feeds degrees AND the bipartite CC

    # ---- degree tables (one grouped count each) ----
    ind = grouped_aggregate(e.select_columns(["dst"]), ["dst"],
                            {"deg": ("count", None)},
                            num_parts=cfg.num_parts)
    outd = grouped_aggregate(e.select_columns(["src"]), ["src"],
                             {"deg": ("count", None)},
                             num_parts=cfg.num_parts)

    # ---- bipartite support graph: hub-role node 2u, authority-role
    # node 2v+1, symmetrized for the CC engine ----
    def bip(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False) * 2
        d = b.column("dst").to_numpy(zero_copy_only=False) * 2 + 1
        return pa.table({
            "src": pa.array(np.concatenate([s, d])),
            "dst": pa.array(np.concatenate([d, s])),
        })

    from .components import connected_components

    bip_edges = e.map_batches(bip, batch_format="pyarrow",
                              zero_copy_batch=True)
    off2 = np.asarray(offsets, dtype=np.int64) * 2
    labels, cc_info = connected_components(
        bip_edges, off2, os.path.join(workdir, "salsa"),
        cfg, job="salsa_cc", shards_dir=os.path.join(workdir, "salsa",
                                                     "csr_bip"))

    lab = labels.select_columns(["vid", "label"]).materialize()
    lab_schema = pa.schema([pa.field("vid", pa.int64()),
                            pa.field("label", pa.int64())])

    info: Dict = {"n": n, "cc_iters": cc_info.get("num_iters")}

    def side(deg_ds, key: str, role_parity: int, out_name: str):
        """Score one side: join role-node labels to the degree table,
        aggregate (count, edge-sum) per component, then one division."""
        # deg table -> bipartite node id of this role
        def to_node(b: pa.Table) -> pa.Table:
            v = b.column(key).to_numpy(zero_copy_only=False)
            return pa.table({
                "node": pa.array(v * 2 + role_parity),
                "vid": b.column(key),
                "deg": b.column("deg"),
            })

        deg_nodes = deg_ds.map_batches(to_node, batch_format="pyarrow",
                                       zero_copy_batch=True)
        dn_schema = pa.schema([pa.field("node", pa.int64()),
                               pa.field("vid", pa.int64()),
                               pa.field("deg", pa.int64())])
        tagged = hash_join(deg_nodes, lab, on="node", right_on="vid",
                           num_parts=cfg.num_parts,
                           left_schema=dn_schema, right_schema=lab_schema)
        tagged = tagged.materialize()  # feeds comp agg AND the back-join
        comp = grouped_aggregate(
            tagged.select_columns(["label", "deg"]), ["label"],
            {"n_side": ("count", None), "m_edges": ("sum", "deg")},
            num_parts=cfg.num_parts)
        total = int(tagged.count())
        info[f"total_{out_name}"] = total
        tg_schema = pa.schema([pa.field("node", pa.int64()),
                               pa.field("vid", pa.int64()),
                               pa.field("deg", pa.int64()),
                               pa.field("label", pa.int64())])
        cp_schema = pa.schema([pa.field("label", pa.int64()),
                               pa.field("n_side", pa.int64()),
                               pa.field("m_edges", pa.int64())])
        scored = hash_join(tagged, comp, on="label", right_on="label",
                           num_parts=cfg.num_parts,
                           left_cols=["vid", "deg"],
                           left_schema=tg_schema, right_schema=cp_schema)

        def score(b: pa.Table) -> pa.Table:
            deg = b.column("deg").to_numpy(zero_copy_only=False)
            ns = b.column("n_side").to_numpy(zero_copy_only=False)
            m = b.column("m_edges").to_numpy(zero_copy_only=False)
            num = (ns * deg).astype(np.float64)
            den = (m * np.int64(total)).astype(np.float64)
            return pa.table({"vid": b.column("vid"),
                             out_name: pa.array(num / den)})

        return scored.map_batches(score, batch_format="pyarrow",
                                  zero_copy_batch=True)

    auth = side(ind, "dst", 1, "authority")
    hub = side(outd, "src", 0, "hub")
    a_schema = pa.schema([pa.field("vid", pa.int64()),
                          pa.field("authority", pa.float64())])
    h_schema = pa.schema([pa.field("vid", pa.int64()),
                          pa.field("hub", pa.float64())])
    both = hash_join(auth, hub, on="vid", right_on="vid",
                     join_type="full", num_parts=cfg.num_parts,
                     left_schema=a_schema, right_schema=h_schema)

    def fill(b: pa.Table) -> pa.Table:
        a = b.column("authority").to_numpy(zero_copy_only=False)
        h = b.column("hub").to_numpy(zero_copy_only=False)
        return pa.table({
            "vid": b.column("vid"),
            "authority": pa.array(np.nan_to_num(a, nan=0.0)),
            "hub": pa.array(np.nan_to_num(h, nan=0.0)),
        })

    return both.map_batches(fill, batch_format="pyarrow",
                            zero_copy_batch=True), info

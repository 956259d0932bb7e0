"""SCAN structural clustering (Xu, Yuruk, Feng & Schweiger, KDD 2007).

Unlike modularity methods (graph/louvain.py, graph/labelprop.py), SCAN
classifies every vertex by its edges' STRUCTURAL SIMILARITY
(graph/metrics.py::scan_similarity — closed-neighborhood cosine):

  - CORE:    |N_eps(v)| >= mu, where N_eps(v) = {v} u {u adjacent to v
             with sigma(u, v) >= eps} (the closed eps-neighborhood);
  - cluster: connected component of the cores under eps-edges whose
             BOTH endpoints are cores, then borders (non-core vertices
             eps-adjacent to a core) attach to their cores' clusters;
  - HUB:     unclustered vertex adjacent (any edge) to >= 2 distinct
             clusters — the web's navigational/mirror pages;
  - OUTLIER: every other unclustered vertex.

This is the hub/outlier separation Louvain cannot express (a hub is
forced into some community), which is exactly what a link-spam /
boilerplate pass wants.  Determinism: cluster id = min core vid in the
component (the CC engine's min-label convention); border attachment =
min cluster id among eps-adjacent cores.  All stages are compositions
of machinery that already has scale physics: the per-edge triangle
support pass, grouped integer counts, bucketed joins, and the CC
shard-actor engine — nothing new materializes on the driver.

Reference anchor: the reference clusters its citation graph only
implicitly via GNN embeddings (link_prediction.py:33-106); SCAN is the
deterministic structural analogue over the same edge table.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np
import pyarrow as pa

from ..config import DEFAULT, EngineConfig
from ..ops.agg import grouped_aggregate
from ..ops.join import hash_join
from .metrics import scan_similarity

_I64 = pa.int64()
_V_SCHEMA = pa.schema([pa.field("vid", _I64)])


def scan_clusters(edges, offsets: np.ndarray, workdir: str,
                  cfg: EngineConfig = DEFAULT, *,
                  eps: float = 0.5, mu: int = 3
                  ) -> Tuple["object", Dict]:
    """Run SCAN over the directed edge table.  Returns (ds, info):
    ds has one row per vertex incident to >= 1 undirected edge, columns
    (vid, label:int64, role:string) with label = min core vid of the
    cluster (-1 for hubs/outliers) and role in
    {"core", "border", "hub", "outlier"}; info carries cardinalities.
    Isolated vertices (no edges) are absent, as in scan_similarity."""
    from .components import connected_components

    if mu < 1:
        raise ValueError("mu must be >= 1")

    sig = scan_similarity(edges, cfg).materialize()

    def sym(b: pa.Table) -> pa.Table:
        s, d = b.column("src").to_numpy(), b.column("dst").to_numpy()
        g = b.column("sigma").to_numpy()
        return pa.table({"src": pa.array(np.concatenate([s, d]), type=_I64),
                         "dst": pa.array(np.concatenate([d, s]), type=_I64),
                         "sigma": pa.array(np.concatenate([g, g]))})

    sym_sig = sig.map_batches(sym, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # closed eps-neighborhood size = 1 + count of eps-similar neighbors
    eps_n = grouped_aggregate(
        sym_sig.filter(expr=f"sigma >= {float(eps)!r}")
        .select_columns(["src"]),
        ["src"], {"n_eps": ("count", None)}, num_parts=cfg.num_parts)
    cores = eps_n.filter(expr=f"n_eps >= {int(mu) - 1}") \
        .map_batches(lambda b: pa.table({"vid": b.column("src")}),
                     batch_format="pyarrow", zero_copy_batch=True) \
        .materialize()

    # CC over eps-edges with BOTH endpoints core (symmetric table in,
    # symmetric table out — the CC engine expects symmetrized input)
    eps_edges = sym_sig.filter(expr=f"sigma >= {float(eps)!r}") \
        .select_columns(["src", "dst"])
    e_schema = pa.schema([pa.field("src", _I64), pa.field("dst", _I64)])
    cc_in = hash_join(eps_edges, cores, on="src", right_on="vid",
                      join_type="semi", num_parts=cfg.num_parts,
                      left_schema=e_schema, right_schema=_V_SCHEMA)
    cc_in = hash_join(cc_in, cores, on="dst", right_on="vid",
                      join_type="semi", num_parts=cfg.num_parts,
                      left_schema=e_schema, right_schema=_V_SCHEMA)
    labels, cc_info = connected_components(
        cc_in, offsets, os.path.join(workdir, f"scan_e{eps}_m{mu}"),
        cfg, job="scan_cc")

    # core labels (isolated cores keep their own vid from the CC engine)
    l_schema = pa.schema([pa.field("vid", _I64), pa.field("label", _I64)])
    core_lab = hash_join(labels.select_columns(["vid", "label"]), cores,
                         on="vid", right_on="vid", join_type="semi",
                         num_parts=cfg.num_parts,
                         left_schema=l_schema, right_schema=_V_SCHEMA
                         ).materialize()

    # border attachment: non-core vertex eps-adjacent to a core ->
    # min cluster label among those cores
    att = hash_join(sym_sig.filter(expr=f"sigma >= {float(eps)!r}")
                    .select_columns(["src", "dst"]),
                    core_lab, on="dst", right_on="vid",
                    num_parts=cfg.num_parts,
                    left_schema=e_schema, right_schema=l_schema)
    att = grouped_aggregate(att.select_columns(["src", "label"]), ["src"],
                            {"label": ("min", "label")},
                            num_parts=cfg.num_parts)
    att_schema = pa.schema([pa.field("src", _I64), pa.field("label", _I64)])
    border = hash_join(att, cores, on="src", right_on="vid",
                       join_type="anti", num_parts=cfg.num_parts,
                       left_schema=att_schema, right_schema=_V_SCHEMA)

    # hub test for the rest: adjacent (ANY edge) to >= 2 distinct
    # clusters.  Members = cores + borders.
    members = core_lab.select_columns(["vid", "label"]).union(
        border.map_batches(lambda b: b.rename_columns(["vid", "label"]),
                           batch_format="pyarrow", zero_copy_batch=True)
    ).materialize()
    nbr_lab = hash_join(sym_sig.select_columns(["src", "dst"]), members,
                        on="dst", right_on="vid", num_parts=cfg.num_parts,
                        left_schema=e_schema, right_schema=l_schema)
    # distinct (src, label) then count per src — exact, key-bounded
    dl = grouped_aggregate(nbr_lab.select_columns(["src", "label"]),
                           ["src", "label"], {"n": ("count", None)},
                           num_parts=cfg.num_parts)
    ncl = grouped_aggregate(dl.select_columns(["src"]), ["src"],
                            {"n_clusters": ("count", None)},
                            num_parts=cfg.num_parts)
    ncl_schema = pa.schema([pa.field("src", _I64),
                            pa.field("n_clusters", _I64)])
    rest = hash_join(ncl, members, on="src", right_on="vid",
                     join_type="anti", num_parts=cfg.num_parts,
                     left_schema=ncl_schema, right_schema=l_schema)

    # every edge-incident vertex: members (core/border) + rest
    # (hub/outlier) + edge-incident vertices with NO member neighbor
    # (absent from ncl): outliers by definition
    core_mark = cores.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "is_core": pa.array(
                                np.ones(b.num_rows, dtype=np.int8))}),
        batch_format="pyarrow", zero_copy_batch=True)
    m_schema = pa.schema([pa.field("vid", _I64),
                          pa.field("is_core", pa.int8())])
    mem_role = hash_join(members, core_mark, on="vid", right_on="vid",
                         join_type="left", num_parts=cfg.num_parts,
                         left_schema=l_schema, right_schema=m_schema)

    def mem_fin(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_c = pc.fill_null(b.column("is_core"), 0).to_numpy(
            zero_copy_only=False)
        role = np.where(is_c == 1, "core", "border")
        return pa.table({"vid": b.column("vid"), "label": b.column("label"),
                         "role": pa.array(role, type=pa.string())})

    mem_out = mem_role.map_batches(mem_fin, batch_format="pyarrow",
                                   zero_copy_batch=True)

    def rest_fin(b: pa.Table) -> pa.Table:
        n = b.column("n_clusters").to_numpy()
        role = np.where(n >= 2, "hub", "outlier")
        return pa.table({"vid": b.column("src"),
                         "label": pa.array(np.full(len(n), -1,
                                                   dtype=np.int64)),
                         "role": pa.array(role, type=pa.string())})

    rest_out = rest.map_batches(rest_fin, batch_format="pyarrow",
                                zero_copy_batch=True)

    # edge-incident vertices with no member neighbor at all
    verts = grouped_aggregate(sym_sig.select_columns(["src"]), ["src"],
                              {"n": ("count", None)},
                              num_parts=cfg.num_parts) \
        .map_batches(lambda b: pa.table({"vid": b.column("src")}),
                     batch_format="pyarrow", zero_copy_batch=True)
    no_mem = hash_join(verts, members, on="vid", right_on="vid",
                       join_type="anti", num_parts=cfg.num_parts,
                       left_schema=_V_SCHEMA, right_schema=l_schema)
    no_mem = hash_join(no_mem, ncl.map_batches(
        lambda b: pa.table({"vid": b.column("src")}),
        batch_format="pyarrow", zero_copy_batch=True),
        on="vid", right_on="vid", join_type="anti",
        num_parts=cfg.num_parts, left_schema=_V_SCHEMA,
        right_schema=_V_SCHEMA)
    lone = no_mem.map_batches(
        lambda b: pa.table({
            "vid": b.column("vid"),
            "label": pa.array(np.full(b.num_rows, -1, dtype=np.int64)),
            "role": pa.array(np.full(b.num_rows, "outlier", dtype=object),
                             type=pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True)

    out = mem_out.union(rest_out).union(lone)
    info = {"eps": eps, "mu": mu, "cc_rounds": cc_info.get("rounds"),
            "n_cores": cores.count(), "n_members": members.count()}
    return out, info

"""Flagship end-to-end pipeline: pages -> graph -> analytics.

The Ray-Data re-expression of the reference's build_metadata ->
LinkPredictionDataset.process -> (training loop) chain
(reference build_metadata.py:26-90, link_prediction_dataset.py:138-261),
with the GNN stage replaced by the deterministic analytics the north
rule requires: PageRank, connected components, triangle counts.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..graph.build import GraphLayers, build_graph, read_layer, symmetrize
from ..graph.components import connected_components
from ..graph.pagerank import pagerank


def run_flagship(pages_path: str, workdir: str,
                 cfg: EngineConfig = DEFAULT,
                 top_k: int = 20) -> Tuple["rd.Dataset", Dict]:
    """Build the link graph and rank it; returns (top_pages_ds, info).

    top_pages_ds: (url, vid, rank, component) for the top_k
    highest-PageRank vertices — a small, human-meaningful head of the
    full outputs (which stay on disk as Parquet layers)."""
    g = build_graph(pages_path, workdir, cfg)
    edges = read_layer(g.edges, cfg=cfg)
    ranks, pr_info = pagerank(edges, g.offsets, workdir, cfg)
    labels, cc_info = connected_components(
        symmetrize(edges, cfg, dedup=False), g.offsets, workdir, cfg)

    # top_k rows only ever reach the driver; the vertex- and
    # label-cardinality tables are filtered DISTRIBUTEDLY by a broadcast
    # semi-join on the tiny top-k vid set (at target scale those tables
    # are 10^12 rows — never .to_pandas() them).
    from ..ops.join import broadcast_semi

    top = ranks.sort("rank", descending=True).limit(top_k).to_pandas()
    vid_keys = pa.table({"vid": pa.array(top["vid"].to_numpy(), type=pa.int64())})
    lab = broadcast_semi(labels.select_columns(["vid", "label"]),
                         "vid", vid_keys, "vid").to_pandas()
    verts = broadcast_semi(read_layer(g.vertices, columns=["vid", "url"], cfg=cfg),
                           "vid", vid_keys, "vid").to_pandas()
    out = (top.merge(verts, on="vid").merge(lab, on="vid")
           .rename(columns={"label": "component"})
           [["url", "vid", "rank", "component"]]
           .sort_values("rank", ascending=False).reset_index(drop=True))
    info = {"graph": g.meta, "pagerank": {k: v for k, v in pr_info.items() if k != "iters"},
            "pagerank_iters": len(pr_info["iters"]),
            "cc_iters": len(cc_info["iters"])}
    return rd.from_pandas(out), info

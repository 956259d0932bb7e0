"""Graph-pipeline conformance queries over the synthesized page corpus.

BASELINE.json's input_hint table (url, warc_ts, html, text, lang) does
not exist in the driver testdata, so these queries synthesize it
deterministically at a scale keyed to the sf directory (fixtures.py,
seed fixed) and run the real pipelines.  They are NOT SQL-expressible
end-to-end (html parsing, iterative analytics), so there are no ORACLE
entries — the driver records rows-only checks; exact/allclose
correctness is enforced by the pytest oracles (tests/oracle.py).
"""

from __future__ import annotations

import os
from typing import Callable, Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from .config import DEFAULT
from .fixtures import ensure_pages_parquet
from .graph.build import GraphLayers, build_graph, read_layer, symmetrize

QUERIES: Dict[str, Callable] = {}

_SEED = 123


def _q(name: str):
    def deco(fn):
        QUERIES[name] = fn
        return fn

    return deco


def _scale_for(sf_dir: str) -> int:
    """Deterministic corpus size keyed to the sf tier (documents rows:
    500 / 5k / 50k -> pages 500 / 5k / 50k)."""
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return max(300, n_docs)


def graph_for(sf_dir: str) -> GraphLayers:
    n = _scale_for(sf_dir)
    pages = ensure_pages_parquet(n, _SEED)
    wd = os.path.join("/tmp/hgr_querygraph", f"n{n}_seed{_SEED}")
    return build_graph(pages, wd)


@_q("q_extract_links")
def q_extract_links(sf_dir: str):
    """Per-page extraction head: url, byte length of text, outlink count."""
    g = graph_for(sf_dir)
    ext = read_layer(g.extracted)

    def stats(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "url": b.column("url"),
            "text_len": pc.binary_length(b.column("text")).cast(pa.int64()),
            "n_links": pc.list_value_length(b.column("links")).cast(pa.int64()),
        })

    return ext.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


@_q("q_graph_vertices")
def q_graph_vertices(sf_dir: str):
    g = graph_for(sf_dir)
    return read_layer(g.vertices)


@_q("q_graph_edges")
def q_graph_edges(sf_dir: str):
    g = graph_for(sf_dir)
    return read_layer(g.edges)


@_q("q_pagerank")
def q_pagerank(sf_dir: str):
    from .graph.pagerank import pagerank

    g = graph_for(sf_dir)
    ranks, _ = pagerank(read_layer(g.edges), g.offsets, g.workdir)

    def quant(b: pa.Table) -> pa.Table:
        r = np.round(b.column("rank").to_numpy(), 9)
        return pa.table({"vid": b.column("vid"), "rank": pa.array(r)})

    return ranks.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)


@_q("q_pagerank_top20")
def q_pagerank_top20(sf_dir: str):
    from .graph.pagerank import pagerank

    g = graph_for(sf_dir)
    ranks, _ = pagerank(read_layer(g.edges), g.offsets, g.workdir)
    from .ops.join import broadcast_semi

    top = ranks.sort("rank", descending=True).limit(20).to_pandas()
    vid_keys = pa.table({"vid": pa.array(top["vid"].to_numpy(), type=pa.int64())})
    verts = broadcast_semi(read_layer(g.vertices, columns=["vid", "url"]),
                           "vid", vid_keys, "vid").to_pandas()
    out = top.merge(verts, on="vid")[["url", "vid", "rank"]]
    out["rank"] = out["rank"].round(9)
    return out.sort_values(["rank", "vid"], ascending=[False, True]).reset_index(drop=True)


@_q("q_components")
def q_components(sf_dir: str):
    from .graph.components import connected_components

    g = graph_for(sf_dir)
    labels, _ = connected_components(
        symmetrize(read_layer(g.edges)), g.offsets, g.workdir)
    return labels.select_columns(["vid", "label"])


@_q("q_component_sizes")
def q_component_sizes(sf_dir: str):
    from .graph.components import connected_components
    from .ops.agg import grouped_aggregate

    g = graph_for(sf_dir)
    labels, _ = connected_components(
        symmetrize(read_layer(g.edges)), g.offsets, g.workdir)
    return grouped_aggregate(labels.select_columns(["label"]), ["label"],
                             {"size": ("count", None)})


@_q("q_triangles")
def q_triangles(sf_dir: str):
    from .graph.triangles import triangles

    g = graph_for(sf_dir)
    per, total = triangles(
        symmetrize(read_layer(g.edges), drop_self_loops=True))
    return per


@_q("q_label_propagation")
def q_label_propagation(sf_dir: str):
    from .graph.labelprop import label_propagation

    g = graph_for(sf_dir)
    labels, _ = label_propagation(
        symmetrize(read_layer(g.edges), drop_self_loops=True),
        g.offsets, g.workdir, rounds=5)
    return labels.select_columns(["vid", "label"])


@_q("q_degree_distribution")
def q_degree_distribution(sf_dir: str):
    """Out-degree histogram — the hub-skew diagnostic."""
    from .ops.agg import grouped_aggregate

    g = graph_for(sf_dir)
    edges = read_layer(g.edges, columns=["src"])
    deg = grouped_aggregate(edges, ["src"], {"outdeg": ("count", None)})
    return grouped_aggregate(deg.select_columns(["outdeg"]), ["outdeg"],
                             {"n_vertices": ("count", None)})


@_q("q_host_counts")
def q_host_counts(sf_dir: str):
    """M7 analogue (reference split_domain, link_prediction_metadata.py:452-470):
    url -> host, vectorized; pages per host."""
    import pyarrow.compute as pc

    from .ops.agg import grouped_aggregate

    g = graph_for(sf_dir)
    urls = read_layer(g.vertices, columns=["url"])

    def host(b: pa.Table) -> pa.Table:
        h = pc.list_element(pc.split_pattern(b.column("url"), "/"), 2)
        return pa.table({"host": h.cast(pa.string())})

    hosts = urls.map_batches(host, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(hosts, ["host"], {"n_pages": ("count", None)})


@_q("q_edge_splits")
def q_edge_splits(sf_dir: str):
    """R1: deterministic train/val/test split sizes."""
    from .graph.splits import split_edges
    from .ops.agg import grouped_aggregate

    g = graph_for(sf_dir)
    s = split_edges(read_layer(g.edges))
    return grouped_aggregate(s.select_columns(["split"]), ["split"],
                             {"n_edges": ("count", None)})


@_q("q_negative_samples")
def q_negative_samples(sf_dir: str):
    """R1: seeded negative (non-edge) samples."""
    from .graph.splits import negative_sample

    g = graph_for(sf_dir)
    return negative_sample(read_layer(g.edges), g.num_vertices, 100)

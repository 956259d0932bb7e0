"""Host-graph contraction — the coarsened web graph (one vertex per
host, edge weight = number of url-level links between the hosts).

The standard first aggregation of any web crawl (host graphs are what
most link-spam, centrality and crawl-scheduling analyses actually run
on: ~10^9 hosts vs ~10^12 urls).  Semantically this is the reference's
``split_domain`` projection (link_prediction_metadata.py:452-470, urls
-> coarser entities) composed with its edge-construction joins — here
as one contraction operator.

Scale shape: hosts get their own dense id space (the same
sorted-per-hash-partition assigner as urls), the url->host id map joins
the edge table twice (the bucketed big-big ``hash_join``, J6/J7
machinery), pair multiplicities are PARTIALLY counted inside the second
join's buckets (combiner — equal host pairs need not co-locate there),
and one grouped sum finishes the weights.  Two joins + one grouped
exchange total; no step materializes anything driver-side.

Host rule: ``string_split(url, '/')[3]`` — identical to
q_host_counts' SQL so the pytest DuckDB oracle compares exactly
(urls without a host component fall into the empty-string host).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..ops.agg import grouped_aggregate
from ..ops.ids import assign_dense_ids_hash
from ..ops.join import hash_join


def hosts_of(urls: pa.ChunkedArray) -> pa.Array:
    """Vectorized url -> host (the q_host_counts rule)."""
    import polars as pl

    s = pl.from_arrow(urls)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    h = s.str.split("/").list.get(2, null_on_oob=True).fill_null("")
    return h.to_arrow().cast(pa.string())


def host_graph(vertices, edges, cfg: EngineConfig = DEFAULT, *,
               drop_self_loops: bool = False
               ) -> Tuple["rd.Dataset", "rd.Dataset", np.ndarray]:
    """Contract a url-level graph to its host graph.

    vertices: (url, vid[, part]); edges: (src, dst).
    Returns (host_vertices(host, hid), host_edges(src_h, dst_h,
    n_links), host_offsets).  ``n_links`` counts url-level edges
    collapsed onto the host pair (multiplicity weight — feed it to
    pagerank(weight_col="n_links") for weighted host rank).
    """
    str_t = pa.string()

    def with_host(b: pa.Table) -> pa.Table:
        return pa.table({"vid": b.column("vid").cast(pa.int64()),
                         "host": hosts_of(b.column("url"))})

    vh = vertices.select_columns(["url", "vid"]).map_batches(
        with_host, batch_format="pyarrow", zero_copy_batch=True)

    host_ids, h_off = assign_dense_ids_hash(
        vh.select_columns(["host"]), "host", cfg.num_parts, id_col="hid")
    hv_schema = pa.schema([pa.field("host", str_t),
                           pa.field("hid", pa.int64())])
    vid2hid = hash_join(vh, host_ids.select_columns(["host", "hid"]),
                        on="host", num_parts=cfg.num_parts,
                        left_schema=pa.schema([pa.field("vid", pa.int64()),
                                               pa.field("host", str_t)]),
                        right_schema=hv_schema
                        ).select_columns(["vid", "hid"])

    v2h_schema = pa.schema([pa.field("vid", pa.int64()),
                            pa.field("hid", pa.int64())])
    e_schema = pa.schema([pa.field("src", pa.int64()),
                          pa.field("dst", pa.int64())])
    j1 = hash_join(edges, vid2hid, on="src", right_on="vid",
                   num_parts=cfg.num_parts,
                   left_schema=e_schema, right_schema=v2h_schema)
    j1 = j1.select_columns(["dst", "hid"]).map_batches(
        lambda b: b.rename_columns(["dst", "src_h"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def contract(t: pa.Table) -> pa.Table:
        """Partial pair counts inside the join-2 bucket (combiner; the
        grouped sum below finishes cross-bucket pairs)."""
        import polars as pl

        df = (pl.from_arrow(t.select(["src_h", "hid"]))
              .rename({"hid": "dst_h"}))
        if drop_self_loops:
            df = df.filter(pl.col("src_h") != pl.col("dst_h"))
        out = (df.group_by(["src_h", "dst_h"]).len(name="n_links")
               .sort(["src_h", "dst_h"]))
        return out.to_arrow().cast(pa.schema([
            pa.field("src_h", pa.int64()), pa.field("dst_h", pa.int64()),
            pa.field("n_links", pa.int64())]))

    j2 = hash_join(j1, vid2hid, on="dst", right_on="vid",
                   num_parts=cfg.num_parts,
                   left_schema=pa.schema([pa.field("dst", pa.int64()),
                                          pa.field("src_h", pa.int64())]),
                   right_schema=v2h_schema,
                   bucket_post=contract)
    host_edges = grouped_aggregate(j2, ["src_h", "dst_h"],
                                   {"n_links": ("sum", "n_links")},
                                   num_parts=cfg.num_parts)
    return (host_ids.select_columns(["host", "hid"]), host_edges,
            np.asarray(h_off, dtype=np.int64))

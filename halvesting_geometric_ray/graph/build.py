"""Graph construction: pages -> extracted -> outlinks -> vertices -> edges.

The Ray-Data re-expression of the reference's build_metadata pipeline
(reference build_metadata.py:26-90 and
link_prediction_metadata.py:193-422):

- extract (M4/M5): per-page html -> (text, outlinks), tolerance semantics
  preserved (malformed -> empty, link_prediction_metadata.py:150-155);
- vertex table (I1 + U1): union of page urls and discovered outlink urls
  (the reference unions cited papers into the paper table,
  link_prediction_metadata.py:308-319), exact dedup, deterministic dense
  vids with contiguous per-partition ranges;
- edge table (J6/J7 + D1): two big-big hash joins resolving
  (src_url, dst_url) -> (src, dst), then exact dedup.

Each stage returns a lazy Dataset; `build_graph` materializes named
Parquet layers (the resume points the reference gets from its
nodes/edges CSV hand-off, build_metadata.py:84-87).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..functions.extract import extract_batch
from ..ops.dedup import distinct
from ..ops.explode import explode
from ..ops.ids import assign_dense_ids_hash, owner_of
from ..ops.join import hash_join


def read_pages(path: str, columns=None):
    return rd.read_parquet(path, columns=columns)


def read_layer(path: str, columns=None, cfg: EngineConfig = DEFAULT):
    """Read a materialized layer with a block count matched to its size.

    Layers are written one file per upstream block, so small/medium layers
    land as 100+ tiny files; per-file reads then give KB-sized blocks
    whose fixed per-block costs dominate every downstream shuffle
    (measured 2x on the vertex/edge stages at sf0.1).  Target ~128 MB
    blocks but never fewer than shuffle_blocks; big layers keep Ray's own
    per-file parallelism."""
    try:
        total = sum(e.stat().st_size for e in os.scandir(path)
                    if e.name.endswith(".parquet"))
    except OSError:
        return rd.read_parquet(path, columns=columns)
    est = int(total // (128 << 20)) + 1
    if est < cfg.shuffle_blocks * 4:
        nb = max(cfg.shuffle_blocks, est)
        return rd.read_parquet(path, columns=columns, override_num_blocks=nb)
    return rd.read_parquet(path, columns=columns)


def extract_pages(pages, batch_size: int = 1024):
    """pages(url, html, ...) -> (url, text, links:list<string>)."""
    return pages.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )


def outlinks_from_extracted(extracted):
    """-> (src_url, dst_url), duplicates preserved (dedup happens on ids)."""
    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["src_url", "dst_url"])

    return explode(extracted, "links", "dst_url", keep=["url"]).map_batches(
        rename, batch_format="pyarrow", zero_copy_batch=True
    )


def build_vertices(pages, outlinks, cfg: EngineConfig = DEFAULT):
    """Union(page urls, outlink dst urls) -> dense ids.

    Returns (vertices_ds(part, url, vid), offsets).
    """
    page_urls = pages.select_columns(["url"])
    dst_urls = outlinks.select_columns(["dst_url"]).map_batches(
        lambda b: b.rename_columns(["url"]), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    all_urls = page_urls.union(dst_urls)
    return assign_dense_ids_hash(all_urls, "url", cfg.num_parts, id_col="vid")


def resolve_edges(outlinks, vertices, cfg: EngineConfig = DEFAULT,
                  weighted: bool = False):
    """(src_url, dst_url) x vertices -> deduped (src:int64, dst:int64).

    weighted=True keeps anchor MULTIPLICITY instead of dropping it:
    output (src, dst, w:int64) where w = number of occurrences of the
    (src_url, dst_url) pair — the natural edge weight for weighted
    PageRank (a page linked 5 times from one source gets 5x that
    source's out-mass share).  Same shuffle count: the count happens
    inside the join-2 bucket task where duplicates are co-located."""
    v = vertices.select_columns(["url", "vid"])
    str_t = pa.string()
    ol_schema = pa.schema([pa.field("src_url", str_t),
                           pa.field("dst_url", str_t)])
    v_schema = pa.schema([pa.field("url", str_t), pa.field("vid", pa.int64())])
    j1 = hash_join(outlinks, v, on="src_url", right_on="url",
                   num_parts=cfg.num_parts,
                   left_schema=ol_schema, right_schema=v_schema)
    j1 = j1.select_columns(["vid", "dst_url"]).map_batches(
        lambda b: b.rename_columns(["src", "dst_url"]), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j1_schema = pa.schema([pa.field("src", pa.int64()),
                           pa.field("dst_url", str_t)])
    # Exact dedup WITHOUT a third shuffle: duplicate (src, dst) pairs share
    # dst_url, so join-2's dst_url-keyed buckets already co-locate them —
    # the bucket_post hook dedups inside the merge task, globally exact.
    def dedup_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        from ..ops._util import cast_like

        pairs = pl.from_arrow(t.select(["vid", "src"])).rename({"vid": "dst"})
        if weighted:
            out = (pairs.group_by(["src", "dst"]).len(name="w")
                   .sort(["src", "dst"])
                   .select(["src", "dst", "w"]))
            want = pa.schema([pa.field("src", pa.int64()),
                              pa.field("dst", pa.int64()),
                              pa.field("w", pa.int64())])
        else:
            out = (pairs.unique(subset=["src", "dst"])
                   .sort(["src", "dst"])
                   .select(["src", "dst"]))
            want = pa.schema([pa.field("src", pa.int64()),
                              pa.field("dst", pa.int64())])
        return cast_like(out.to_arrow(), want)

    return hash_join(j1, v, on="dst_url", right_on="url",
                     num_parts=cfg.num_parts,
                     left_schema=j1_schema, right_schema=v_schema,
                     bucket_post=dedup_bucket)


@dataclass
class GraphLayers:
    workdir: str
    extracted: str
    vertices: str
    edges: str
    meta: dict

    @property
    def offsets(self) -> np.ndarray:
        return np.asarray(self.meta["offsets"], dtype=np.int64)

    @property
    def num_vertices(self) -> int:
        return int(self.meta["num_vertices"])


def build_graph(pages_path: str, workdir: str,
                cfg: EngineConfig = DEFAULT, force: bool = False) -> GraphLayers:
    """Run the full construction, materializing named Parquet layers.

    Layers already on disk (with _META committed) are skipped — the
    coarse-grained resume analogue of the reference's
    --compute_nodes/--compute_edges flags (build_metadata.py:84-87).
    """
    os.makedirs(workdir, exist_ok=True)
    meta_path = os.path.join(workdir, "_META.json")
    layers = {k: os.path.join(workdir, k) for k in ("extracted", "vertices", "edges")}
    if not force and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        return GraphLayers(workdir, layers["extracted"], layers["vertices"],
                           layers["edges"], meta)

    pages = read_pages(pages_path, columns=["url", "html"])
    extracted = extract_pages(pages, batch_size=cfg.extract_batch_size)
    extracted.write_parquet(layers["extracted"])

    # materialize the exploded outlinks once: they feed the vertex union
    # AND both resolution joins (re-deriving re-reads + re-explodes the
    # extracted layer each time); prune to (url, links) — text stays on disk
    outlinks = outlinks_from_extracted(
        read_layer(layers["extracted"], columns=["url", "links"], cfg=cfg)
    ).materialize()
    vertices, offsets = build_vertices(
        read_layer(layers["extracted"], columns=["url"], cfg=cfg), outlinks, cfg)
    vertices.write_parquet(layers["vertices"])

    vertices_ds = read_layer(layers["vertices"], cfg=cfg)
    edges = resolve_edges(outlinks, vertices_ds, cfg)
    edges.write_parquet(layers["edges"])
    if not os.path.isdir(layers["edges"]) or not os.listdir(layers["edges"]):
        # an empty Dataset writes no files; keep the layer readable
        import pyarrow.parquet as pq

        os.makedirs(layers["edges"], exist_ok=True)
        pq.write_table(
            pa.schema([pa.field("src", pa.int64()),
                       pa.field("dst", pa.int64())]).empty_table(),
            os.path.join(layers["edges"], "part-empty.parquet"))

    n_edges = rd.read_parquet(layers["edges"]).count()
    meta = {
        "offsets": [int(x) for x in offsets],
        "num_vertices": int(offsets[-1]),
        "num_edges": int(n_edges),
        "num_parts": cfg.num_parts,
        "pages_path": pages_path,
    }
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)
    return GraphLayers(workdir, layers["extracted"], layers["vertices"],
                       layers["edges"], meta)


def weighted_edges(g: GraphLayers, cfg: EngineConfig = DEFAULT):
    """Anchor-multiplicity weighted edge table (src, dst, w:int64),
    derived LAZILY from the materialized extracted + vertices layers —
    not a stored layer: the weighted consumer (pagerank weight_col)
    caches its own CSR shards, so this resolve executes only on a cold
    shard build and is skipped entirely once {workdir}/csr_w exists."""
    outlinks = outlinks_from_extracted(
        read_layer(g.extracted, columns=["url", "links"], cfg=cfg))
    return resolve_edges(outlinks, read_layer(g.vertices, cfg=cfg), cfg,
                         weighted=True)


def symmetrize(edges, cfg: EngineConfig = DEFAULT, drop_self_loops: bool = False,
               dedup: bool = True):
    """Undirected view: union(edges, swapped) + exact dedup (G1 of SURVEY
    2.6; reference ToUndirected, link_prediction_datamodule.py:124-136).

    dedup=False skips the global distinct SHUFFLE — safe when the
    consumer dedups per co-located key group itself (build_csr_shards
    dedups (src, dst) inside each shard), which is how CC/LP consume it."""
    def swap(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("dst"), "dst": b.column("src")})

    sym = edges.union(
        edges.map_batches(swap, batch_format="pyarrow", zero_copy_batch=True))
    if drop_self_loops:
        import pyarrow.compute as pc

        sym = sym.map_batches(
            lambda b: b.filter(pc.invert(pc.equal(b["src"], b["dst"]))),
            batch_format="pyarrow", zero_copy_batch=True)
    if not dedup:
        return sym
    return distinct(sym, ["src", "dst"], num_parts=cfg.num_parts)

"""Incremental graph updates — the daily-crawl-delta path.

A 100-TB link graph is never rebuilt from scratch: each crawl batch
adds pages.  ``extend_graph`` folds a delta page table into existing
graph layers with

- **stable ids**: every existing url keeps its vid; new urls get dense
  ids ``N_old ..`` assigned by the same sorted-per-hash-partition
  scheme, appended as NEW partitions (offsets grow, the old prefix is
  untouched);
- **layer reuse**: unchanged layer files are HARD-LINKED into the new
  layer directories (O(files), no data copied); only delta files are
  written;
- **CSR cache reuse** (``extend_csr_shards``): because delta edges'
  sources live in the new partitions, every old shard file — including
  its pre-factored udst routing, which only ever references old vids
  whose owning part is unchanged under the extended offsets — stays
  byte-valid; only the new partitions' shards are built, and the done
  marker is restamped so downstream consumers (pagerank/hits/anf/...)
  adopt the cache without rescanning a single old edge;
- **warm-started PageRank**: pass the previous converged ranks as
  ``pagerank(..., warm_ranks=old_ranks)`` — old vertices resume at
  their converged mass, new ones at 1/N, and the run reaches the new
  fixpoint in a fraction of the cold iteration count (measured in
  tests/test_incremental.py and BASELINE.md).

Semantics / scope: the delta must consist of pages whose urls are NOT
already vertices-with-outlinks — i.e. new documents.  Re-crawled pages
(url already present) are FILTERED OUT of the delta (idempotent:
re-running extend_graph with the same delta is a no-op); replacing an
existing page's outlinks would require edge retraction, which is a
rebuild, not an append.  Delta outlinks may point anywhere (old or new
urls) — that is the common case and fully supported.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..ops.dedup import distinct
from ..ops.ids import assign_dense_ids_hash
from ..ops.join import hash_join
from .build import (GraphLayers, extract_pages, outlinks_from_extracted,
                    read_layer, read_pages, resolve_edges)


def _link_layer(src_dir: str, dst_dir: str) -> int:
    """Hard-link every parquet file of src_dir into dst_dir (copy
    fallback for cross-device).  Returns the file count."""
    os.makedirs(dst_dir, exist_ok=True)
    n = 0
    for e in os.scandir(src_dir):
        if not e.name.endswith(".parquet"):
            continue
        dst = os.path.join(dst_dir, e.name)
        if not os.path.exists(dst):
            try:
                os.link(e.path, dst)
            except OSError:
                shutil.copy2(e.path, dst)
        n += 1
    return n


def extend_graph(g: GraphLayers, new_pages_path: str, out_workdir: str,
                 cfg: EngineConfig = DEFAULT,
                 force: bool = False) -> GraphLayers:
    """Fold a delta page table into ``g``; materialize v2 layers under
    ``out_workdir`` (old files hard-linked, delta files appended).
    Returns the extended GraphLayers; ``extend_csr_shards`` below
    carries the CSR cache forward."""
    os.makedirs(out_workdir, exist_ok=True)
    meta_path = os.path.join(out_workdir, "_META.json")
    layers = {k: os.path.join(out_workdir, k)
              for k in ("extracted", "vertices", "edges")}
    if not force and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        return GraphLayers(out_workdir, layers["extracted"],
                           layers["vertices"], layers["edges"], meta)

    N_old = g.num_vertices
    P_old = len(g.offsets) - 1
    gen = int(g.meta.get("generation", 0)) + 1
    pref = f"d{gen}-"
    str_t = pa.string()
    url_schema = pa.schema([pa.field("url", str_t)])

    # 1) delta pages, re-crawls filtered (idempotency): anti-join the
    # delta urls against the existing vertex urls
    pages = read_pages(new_pages_path, columns=["url", "html"])
    old_urls = read_layer(g.vertices, columns=["url"], cfg=cfg)
    fresh = hash_join(pages, old_urls, on="url", join_type="anti",
                      num_parts=cfg.num_parts,
                      left_schema=pa.schema([pa.field("url", str_t),
                                             pa.field("html", pa.binary())]),
                      right_schema=url_schema)
    # A url appearing twice WITHIN one delta batch must extract once —
    # the extracted layer's invariant is one row per url (edges/vertices
    # were already safe via resolve_edges dedup + distinct).  Keeper is
    # the minimal content hash: deterministic under any partitioning.
    from ..functions.hashing import stable_hash64
    from ..ops.dedup import keep_min_by

    fresh = keep_min_by(
        fresh.map_batches(
            lambda b: b.append_column(
                "__h", pa.array(stable_hash64(b.column("html")))),
            batch_format="pyarrow", zero_copy_batch=True),
        ["url"], "__h", num_parts=cfg.num_parts,
    ).map_batches(lambda b: b.drop_columns(["__h"]),
                  batch_format="pyarrow", zero_copy_batch=True)

    def _emit_delta(ds, layer_dir: str):
        """Write ds into layer_dir under this generation's unique
        prefix; returns the exact file list (chaining-safe: scanning by
        prefix would confuse earlier generations' deltas)."""
        tmp = os.path.join(layer_dir, f"_delta{gen}")
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        out = []
        if os.path.isdir(tmp):
            for e in sorted(os.scandir(tmp), key=lambda e: e.name):
                if e.name.endswith(".parquet"):
                    dst = os.path.join(layer_dir, pref + e.name)
                    os.replace(e.path, dst)
                    out.append(dst)
        shutil.rmtree(tmp, ignore_errors=True)
        return out

    for d in layers.values():
        os.makedirs(d, exist_ok=True)
    _link_layer(g.extracted, layers["extracted"])
    ex_files = _emit_delta(
        extract_pages(fresh, batch_size=cfg.extract_batch_size),
        layers["extracted"])

    if ex_files:
        outlinks = outlinks_from_extracted(
            rd.read_parquet(ex_files, columns=["url", "links"])).materialize()
        d_page_urls = rd.read_parquet(ex_files, columns=["url"])
    else:  # empty delta (all re-crawls): keep the pipeline typed
        outlinks = rd.from_arrow(pa.table(
            {"src_url": pa.array([], type=str_t),
             "dst_url": pa.array([], type=str_t)}))
        d_page_urls = rd.from_arrow(pa.table({"url": pa.array([],
                                                              type=str_t)}))

    # 2) new urls = (delta page urls ∪ delta outlink dsts) \ old urls
    d_urls = d_page_urls.union(
        outlinks.select_columns(["dst_url"]).map_batches(
            lambda b: b.rename_columns(["url"]), batch_format="pyarrow",
            zero_copy_batch=True))
    new_urls = hash_join(distinct(d_urls, ["url"],
                                  num_parts=cfg.num_parts),
                         old_urls, on="url", join_type="anti",
                         num_parts=cfg.num_parts,
                         left_schema=url_schema, right_schema=url_schema)
    new_v, local_off = assign_dense_ids_hash(new_urls, "url",
                                             cfg.num_parts, id_col="vid")

    def shift(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # column order matches the old layer files (url, part, vid) so
        # the extended directory reads as one homogeneous dataset
        return pa.table({
            "url": b.column("url"),
            "part": pc.add(b.column("part"),
                           pa.scalar(P_old, type=pa.int32())),
            "vid": pc.add(b.column("vid"), pa.scalar(N_old,
                                                     type=pa.int64())),
        })

    _link_layer(g.vertices, layers["vertices"])
    _emit_delta(new_v.map_batches(shift, batch_format="pyarrow",
                                  zero_copy_batch=True),
                layers["vertices"])
    offsets_v2 = np.concatenate([g.offsets,
                                 N_old + local_off[1:]]).astype(np.int64)

    # 3) delta edges: resolve against the FULL v2 vertex table (dsts may
    # be old urls).  Delta srcs are new vids only (re-crawls filtered),
    # so old ∪ delta is dedup-clean without touching old edges.
    vertices_v2 = read_layer(layers["vertices"], cfg=cfg)
    _link_layer(g.edges, layers["edges"])
    e_files = _emit_delta(resolve_edges(outlinks, vertices_v2, cfg),
                          layers["edges"])
    n_new_edges = sum(pq.read_metadata(f).num_rows for f in e_files)

    meta = {
        "offsets": [int(x) for x in offsets_v2],
        "num_vertices": int(offsets_v2[-1]),
        "num_edges": int(g.meta["num_edges"]) + int(n_new_edges),
        "num_parts": len(offsets_v2) - 1,
        "pages_path": g.meta.get("pages_path"),
        "delta_pages_path": new_pages_path,
        "extends": g.workdir,
        "generation": gen,
        "delta_edge_files": [os.path.basename(f) for f in e_files],
    }
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)
    return GraphLayers(out_workdir, layers["extracted"], layers["vertices"],
                       layers["edges"], meta)


def delta_paths(layer_dir: str):
    """All parquet files of a (possibly extended) layer directory."""
    return [e.path for e in sorted(os.scandir(layer_dir),
                                   key=lambda e: e.name)
            if e.name.endswith(".parquet")]


def extend_csr_shards(old_shards_dir: str, new_shards_dir: str,
                      g2: GraphLayers, old_num_parts: int,
                      lineage: Optional[Dict] = None) -> bool:
    """Carry an existing CSR shard cache forward to the extended graph:
    hard-link every old shard (byte-valid — old edges and the old-vid
    ownership prefix are unchanged), build shards for the NEW partitions
    from the delta edge files only, and restamp the done marker so
    ``build_csr_shards(edges_v2, offsets_v2, new_shards_dir, ...)``
    adopts the cache.  Returns False (caller falls back to a full
    build) when the old marker is missing or stamped with a different
    lineage."""
    from .csr import _shard_table, build_csr_shards  # noqa: F401

    lineage = lineage or {"kind": "directed"}
    old_done = os.path.join(old_shards_dir, "_SHARDS_DONE")
    if not os.path.exists(old_done):
        return False
    with open(old_done) as f:
        prev = json.load(f)
    if prev.get("lineage") != lineage or "weight_col" in prev:
        return False
    offsets = g2.offsets
    num_parts = len(offsets) - 1
    os.makedirs(new_shards_dir, exist_ok=True)
    for p in range(old_num_parts):
        src = os.path.join(old_shards_dir, f"shard-{p:05d}.parquet")
        dst = os.path.join(new_shards_dir, f"shard-{p:05d}.parquet")
        if not os.path.exists(dst):
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)

    delta_files = [os.path.join(g2.edges, name)
                   for name in g2.meta.get("delta_edge_files", [])]
    lo_new = int(offsets[old_num_parts])

    def add_part(b: pa.Table) -> pa.Table:
        from ..ops.ids import owner_of

        src = b.column("src").to_numpy()
        if src.size and src.min() < lo_new:
            raise ValueError(
                "delta edges contain sources in old partitions — the old "
                "shard cache cannot be extended; rebuild with "
                "build_csr_shards")
        part = owner_of(src, offsets)
        return b.append_column("part", pa.array(part, type=pa.int32()))

    def build(gt: pa.Table) -> pa.Table:
        p = int(gt.column("part")[0].as_py())
        src = gt.column("src").to_numpy()
        dst = gt.column("dst").to_numpy()
        t = _shard_table(p, int(offsets[p]), int(offsets[p + 1]), src, dst,
                         offsets)
        path = os.path.join(new_shards_dir, f"shard-{p:05d}.parquet")
        tmp = f"{path}.tmp{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return pa.table({"part": pa.array([p], type=pa.int32())})

    from ..ops._util import pre_shuffle

    present = set()
    if delta_files:
        built = (pre_shuffle(
            rd.read_parquet(delta_files).map_batches(
                add_part, batch_format="pyarrow", zero_copy_batch=True))
            .groupby("part")
            .map_groups(build, batch_format="pyarrow",
                        retry_exceptions=True).to_pandas())
        if "part" in built.columns:
            present = set(built["part"].tolist())
    for p in range(old_num_parts, num_parts):
        if p not in present:
            t = _shard_table(p, int(offsets[p]), int(offsets[p + 1]),
                             np.empty(0, dtype=np.int64),
                             np.empty(0, dtype=np.int64), offsets)
            pq.write_table(t, os.path.join(new_shards_dir,
                                           f"shard-{p:05d}.parquet"))
    stamp = {"lineage": lineage, "num_parts": num_parts,
             "n": int(offsets[-1])}
    with open(os.path.join(new_shards_dir, "_SHARDS_DONE"), "w") as f:
        json.dump(stamp, f)
    return True

"""Reference-parity metadata graph construction over nested JSON rows.

The Ray-Data re-expression of the reference's compute_nodes /
compute_edges (build_metadata.py:50-87,
link_prediction_metadata.py:193-422) over rows of shape
``{halid, title, lang, year, domain: list<str>,
authors: list<struct{name, halauthorid, affiliations: list<str>}>}``:

- explode + normalize the nested author structs (M1/M2,
  build_metadata.py:59-68) as zero-copy Arrow list/struct kernels;
- language filter (F2, link_prediction_metadata.py:368-371), non-empty
  filters (F4: title != "", name != "", halauthorid != 0,
  link_prediction_metadata.py:384,392,237);
- `split_domain` (M7, link_prediction_metadata.py:452-470):
  "cs.AI" -> "cs", empty -> "other";
- per node type: project -> exact dedup (D2) -> dense zip-with-index ids
  (I1) done ORDER-INDEPENDENTLY (sorted), avoiding the reference's
  cross-partition index bug (link_prediction_metadata.py:349-353);
- typed edge tables via dimension joins (J1-J5) + exact dedup (D1);
  keys stay int64 throughout (the reference's float-keyed joins at
  :240,264 are a bug-smell, not semantics).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..ops._util import pre_shuffle
from ..ops.agg import grouped_aggregate
from ..ops.dedup import distinct
from ..ops.ids import assign_dense_ids_sorted
from ..ops.join import broadcast_lookup, hash_join


def read_meta(path: str):
    return rd.read_json(path)


def explode_authors(meta):
    """-> (halid, name, halauthorid:int64, affiliations:list<string>)."""

    def fn(b: pa.Table) -> pa.Table:
        col = b.column("authors")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parent = pc.list_parent_indices(col)
        flat = pc.list_flatten(col)
        halid = pc.take(b.column("halid"), parent)
        name = pc.struct_field(flat, "name")
        aid = pc.struct_field(flat, "halauthorid").cast(pa.int64())
        affs = pc.struct_field(flat, "affiliations")
        return pa.table({
            "halid": halid.cast(pa.string()),
            "name": name.cast(pa.string()),
            "halauthorid": aid,
            "affiliations": affs,
        })

    return meta.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def split_domain_batch(arr: pa.Array) -> pa.Array:
    """M7: leading dotted segment, empty/null -> 'other'."""
    first = pc.list_element(pc.split_pattern(arr, "."), 0)
    empty = pc.or_kleene(pc.is_null(first), pc.equal(first, ""))
    return pc.if_else(empty, pa.scalar("other"), first).cast(pa.string())


def build_metadata_graph(meta_path: str, workdir: str,
                         langs: Optional[List[str]] = None,
                         cfg: EngineConfig = DEFAULT,
                         id_mode: str = "sorted") -> Dict[str, "rd.Dataset"]:
    """Returns the node/edge tables as Datasets (also written as Parquet
    layers under workdir): papers, authors, affiliations, domains,
    writes, affiliated_with, has_topic.

    id_mode: paper-id assignment.  "sorted" (default) reproduces the
    reference's row_number-over-sorted-halid ids exactly (SQL-oracle
    parity) but funnels the paper key set through one sort task;
    "hash" is the scale path — hash-partitioned dense ids with
    contiguous per-partition ranges (ops.ids.assign_dense_ids_hash),
    same graph up to a paper-id relabeling.  Dimension tables
    (authors/affiliations/domains) always use sorted ids."""
    if id_mode not in ("sorted", "hash"):
        raise ValueError(id_mode)
    os.makedirs(workdir, exist_ok=True)
    meta = read_meta(meta_path)
    if langs:
        meta = meta.map_batches(
            lambda b: b.filter(pc.is_in(b["lang"], value_set=pa.array(langs))),
            batch_format="pyarrow", zero_copy_batch=True)
    meta = meta.materialize()

    # ---- nodes ----------------------------------------------------------
    papers_src = meta.map_batches(
        lambda b: b.filter(pc.not_equal(b["title"], ""))
        .select(["halid", "title", "lang", "year"]),
        batch_format="pyarrow", zero_copy_batch=True)
    if id_mode == "hash":
        from ..ops.ids import assign_dense_ids_hash

        papers_ids, _ = assign_dense_ids_hash(
            papers_src.select_columns(["halid"]), "halid", cfg.num_parts,
            id_col="paper_idx")
        papers_ids = papers_ids.select_columns(["halid", "paper_idx"]).materialize()
    else:
        papers_ids = assign_dense_ids_sorted(
            papers_src.select_columns(["halid"]), "halid",
            id_col="paper_idx").materialize()
    # papers is the reference's 18.6M-row table
    # (link_prediction_dataset.py:54) — the one node table that is NOT a
    # dimension, so attributes attach via a partitioned hash_join, never
    # a driver-pandas broadcast.
    _str = pa.string()
    ids_schema = pa.schema([pa.field("halid", _str),
                            pa.field("paper_idx", pa.int64())])
    attrs_schema = pa.schema([pa.field("halid", _str), pa.field("title", _str),
                              pa.field("lang", _str),
                              pa.field("year", pa.int64())])
    paper_attrs = distinct(papers_src, ["halid"],
                           select=["halid", "title", "lang", "year"],
                           num_parts=cfg.num_parts)
    papers = hash_join(papers_ids, paper_attrs, on="halid",
                       num_parts=cfg.num_parts,
                       left_schema=ids_schema, right_schema=attrs_schema)

    exploded = explode_authors(meta).materialize()
    authors_src = exploded.map_batches(
        lambda b: b.filter(pc.and_(pc.not_equal(b["halauthorid"], 0),
                                   pc.not_equal(b["name"], "")))
        .select(["halauthorid", "name"]),
        batch_format="pyarrow", zero_copy_batch=True)
    authors = assign_dense_ids_sorted(
        authors_src.select_columns(["halauthorid"]), "halauthorid",
        id_col="author_idx")
    # reference parity: authors.csv carries name alongside halauthorid
    # (compute_nodes, link_prediction_metadata.py:384-392).  Deterministic
    # representative name = min(name) per id; authors is a dimension
    # (238k rows at reference scale) so a broadcast lookup is right.
    author_names = grouped_aggregate(authors_src, ["halauthorid"],
                                     {"name": ("min", "name")},
                                     num_parts=cfg.num_parts)
    authors = broadcast_lookup(
        authors, "halauthorid",
        pa.Table.from_pandas(author_names.to_pandas(), preserve_index=False),
        "halauthorid", ["name"])

    def expl_affs(b: pa.Table) -> pa.Table:
        col = b.column("affiliations")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parent = pc.list_parent_indices(col)
        flat = pc.list_flatten(col).cast(pa.string())
        aid = pc.take(b.column("halauthorid"), parent)
        t = pa.table({"halauthorid": aid, "affiliation": flat})
        return t.filter(pc.not_equal(t["affiliation"], ""))

    author_affs = exploded.map_batches(
        lambda b: expl_affs(b.filter(pc.not_equal(b["halauthorid"], 0))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    affiliations = assign_dense_ids_sorted(
        author_affs.select_columns(["affiliation"]), "affiliation",
        id_col="affiliation_idx")

    def expl_domains(b: pa.Table) -> pa.Table:
        col = b.column("domain")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parent = pc.list_parent_indices(col)
        flat = pc.list_flatten(col).cast(pa.string())
        halid = pc.take(b.column("halid"), parent)
        return pa.table({"halid": halid.cast(pa.string()),
                         "domain": split_domain_batch(flat)})

    paper_domains = meta.map_batches(expl_domains, batch_format="pyarrow",
                                     zero_copy_batch=True).materialize()
    domains = assign_dense_ids_sorted(
        paper_domains.select_columns(["domain"]), "domain", id_col="domain_idx")

    # small dimension tables -> driver Arrow for broadcast joins
    # (authors/affiliations/domains: 238k/96k/20 rows at reference scale —
    # legitimately small; papers is NOT here, it joins via hash_join)
    authors_t = pa.Table.from_pandas(authors.to_pandas(), preserve_index=False)
    affil_t = pa.Table.from_pandas(affiliations.to_pandas(), preserve_index=False)
    domains_t = pa.Table.from_pandas(domains.to_pandas(), preserve_index=False)
    # ---- edges (J1-J5 broadcast; paper-keyed J4/J7 hash_join + D1) -----
    ap = exploded.map_batches(
        lambda b: b.select(["halid", "halauthorid"])
        .filter(pc.not_equal(b["halauthorid"], 0)),
        batch_format="pyarrow", zero_copy_batch=True)
    ap_schema = pa.schema([pa.field("halid", _str),
                           pa.field("halauthorid", pa.int64())])
    ap = hash_join(ap, papers_ids, on="halid", num_parts=cfg.num_parts,
                   left_schema=ap_schema, right_schema=ids_schema)
    ap = broadcast_lookup(ap, "halauthorid",
                          authors_t.select(["halauthorid", "author_idx"]),
                          "halauthorid", ["author_idx"])
    writes = distinct(ap.select_columns(["author_idx", "paper_idx"]),
                      ["author_idx", "paper_idx"], num_parts=cfg.num_parts)

    aa = broadcast_lookup(author_affs, "halauthorid",
                          authors_t.select(["halauthorid", "author_idx"]),
                          "halauthorid", ["author_idx"])
    aa = broadcast_lookup(aa, "affiliation",
                          affil_t.select(["affiliation", "affiliation_idx"]),
                          "affiliation", ["affiliation_idx"])
    affiliated_with = distinct(
        aa.select_columns(["author_idx", "affiliation_idx"]),
        ["author_idx", "affiliation_idx"], num_parts=cfg.num_parts)

    pdom_schema = pa.schema([pa.field("halid", _str),
                             pa.field("domain", _str)])
    pd_ = hash_join(paper_domains, papers_ids, on="halid",
                    num_parts=cfg.num_parts,
                    left_schema=pdom_schema, right_schema=ids_schema)
    pd_ = broadcast_lookup(pd_, "domain",
                           domains_t.select(["domain", "domain_idx"]),
                           "domain", ["domain_idx"])
    has_topic = distinct(pd_.select_columns(["paper_idx", "domain_idx"]),
                         ["paper_idx", "domain_idx"], num_parts=cfg.num_parts)

    out = {"papers": papers, "authors": authors, "affiliations": affiliations,
           "domains": domains, "writes": writes,
           "affiliated_with": affiliated_with, "has_topic": has_topic}
    for name, ds in out.items():
        ds.write_parquet(os.path.join(workdir, name))
    return {name: rd.read_parquet(os.path.join(workdir, name)) for name in out}

"""Anchor-text extraction + incoming-anchor aggregation.

The web-search / LLM-dataset view of the link graph: each link's anchor
text DESCRIBES its target, and the per-target aggregate (how many links
point here, with which dominant phrasing) is a standard page-quality /
retrieval signal.  The reference's citation pipeline carries only the
(citing, cited) pair (link_prediction_metadata.py:289-339); this keeps
the edge payload too.

Scale shape: extraction is the same irreducible per-document Python
parse as functions/extract.py (stdlib HTMLParser is the definition; one
output row per LINK, columns assembled columnar); aggregation is one
dst-partitioned exchange with a batch-level combiner (per-batch
(dst, anchor) counts collapse before the shuffle).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Tuple

import numpy as np
import pyarrow as pa

from ..ops.agg import grouped_aggregate


class _AnchorParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.out: List[Tuple[str, str]] = []
        self._href = None
        self._buf: List[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._href = dict(attrs).get("href")
            self._buf = []

    def handle_data(self, data):
        if self._href is not None:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if tag == "a" and self._href is not None:
            self.out.append((self._href, " ".join(
                "".join(self._buf).split())))
            self._href = None


def anchors_one(html: bytes) -> List[Tuple[str, str]]:
    """(href, anchor_text) pairs from html bytes — never raises; the
    same tolerant contract as extract.extract_one (bad utf-8 or a
    truncated document yields no links)."""
    try:
        s = html.decode("utf-8", errors="strict")
    except (UnicodeDecodeError, AttributeError):
        return []
    if not s.rstrip().endswith("</html>"):
        return []
    p = _AnchorParser()
    try:
        p.feed(s)
        p.close()
    except Exception:
        return []
    return p.out


def anchor_edges(pages):
    """pages(url, html) -> one row per link: (src, dst, anchor)."""
    def fn(b: pa.Table) -> pa.Table:
        srcs: List[str] = []
        dsts: List[str] = []
        txts: List[str] = []
        urls = b.column("url").to_pylist()
        for u, h in zip(urls, b.column("html").to_pylist()):
            for href, txt in anchors_one(h):
                srcs.append(u)
                dsts.append(href)
                txts.append(txt)
        return pa.table({"src": pa.array(srcs, type=pa.string()),
                         "dst": pa.array(dsts, type=pa.string()),
                         "anchor": pa.array(txts, type=pa.string())})

    return pages.map_batches(fn, batch_format="pyarrow",
                             zero_copy_batch=True)


def incoming_anchors(edges, top_k: int = 3,
                     num_parts: int = 16):
    """Per-target aggregate over (src, dst, anchor) edges:
    (dst, n_links, n_anchors, top_anchors) with top_anchors the top-k
    anchor strings by count (ties: anchor asc) joined by ' | '.

    Two-level: per-batch (dst, anchor) counts are the combiner, then
    ONE dst-hash exchange finishes counts and picks the top phrases per
    target inside the partition."""
    import polars as pl

    from ..functions.hashing import stable_hash64
    from ..ops._util import pre_shuffle

    def local(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select(["dst", "anchor"]))
              .group_by(["dst", "anchor"]).len()
              .with_columns(pl.col("len").cast(pl.Int64).alias("c"))
              .drop("len"))
        t = df.to_arrow().cast(pa.schema([
            pa.field("dst", pa.string()), pa.field("anchor", pa.string()),
            pa.field("c", pa.int64())]))
        h = np.asarray(stable_hash64(t.column("dst"))) % num_parts
        return t.append_column("__p", pa.array(h.astype(np.int32)))

    def per_part(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns(["__p"]))
              .group_by(["dst", "anchor"]).agg(pl.col("c").sum()))
        agg = (df.sort(["dst", "c", "anchor"],
                       descending=[False, True, False])
               .group_by("dst", maintain_order=True)
               .agg(pl.col("c").sum().alias("n_links"),
                    pl.len().cast(pl.Int64).alias("n_anchors"),
                    pl.col("anchor").head(top_k).str.join(" | ")
                    .alias("top_anchors")))
        return agg.to_arrow().cast(pa.schema([
            pa.field("dst", pa.string()),
            pa.field("n_links", pa.int64()),
            pa.field("n_anchors", pa.int64()),
            pa.field("top_anchors", pa.string())]))

    prepped = edges.map_batches(local, batch_format="pyarrow",
                                zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby("__p")
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))

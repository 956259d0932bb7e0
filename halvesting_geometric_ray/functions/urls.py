"""URL canonicalization — the webtext analogue of the reference's
string normalizers (split_domain, link_prediction_metadata.py:452-470).

Deduplicating a web corpus by url requires a DETERMINISTIC canonical
form: the same resource fetched as `HTTP://Example.com:80/a#x` and
`http://example.com/a` must collapse to one vertex.  Rules (pinned,
documented — changing any rule changes vertex identity and therefore
graph cardinalities):

1. scheme lowercased;
2. host lowercased; default port stripped (`:80` for http, `:443` for
   https); other ports kept;
3. fragment removed;
4. empty path -> "/";
5. query string kept byte-for-byte (param reordering is NOT applied:
   order can be semantically significant, and a lossy rule here would
   merge distinct resources).

Vectorized: one polars regex extract into (scheme, host, path, query)
plus conditional replaces — no Python loop.  Strings that do not parse
as scheme://... are passed through unchanged (tolerance semantics of the
extractor, reference link_prediction_metadata.py:150-155).
"""

from __future__ import annotations

import pyarrow as pa

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(?:#.*)?$"


def canonicalize_urls_batch(b: pa.Table, col: str = "url",
                            out_col: str = "canonical_url") -> pa.Table:
    """Append ``out_col`` with the canonical form of ``col``."""
    import polars as pl

    df = pl.from_arrow(b.select([col]))
    s = df.get_column(col)
    parts = s.str.extract_groups(_URL_RE).struct.rename_fields(
        ["scheme", "host", "path", "query"])
    df = df.with_columns(parts.alias("p")).unnest("p")
    scheme = pl.col("scheme").str.to_lowercase()
    host = pl.col("host").str.to_lowercase()
    host = (pl.when(scheme == "http").then(host.str.replace(r":80$", ""))
            .when(scheme == "https").then(host.str.replace(r":443$", ""))
            .otherwise(host))
    path = (pl.when(pl.col("path") == "").then(pl.lit("/"))
            .otherwise(pl.col("path")))
    canon = (scheme + "://" + host + path +
             pl.col("query").fill_null(""))
    out = df.with_columns(
        # unparseable -> passthrough (scheme group null)
        pl.when(pl.col("scheme").is_null()).then(pl.col(col))
        .otherwise(canon).alias(out_col))
    arr = out.get_column(out_col).to_arrow().cast(pa.string())
    return b.append_column(out_col, arr)


def canonicalize_urls(ds, col: str = "url", out_col: str = "canonical_url"):
    """Dataset wrapper: append the canonical url column."""
    return ds.map_batches(
        lambda b: canonicalize_urls_batch(b, col, out_col),
        batch_format="pyarrow", zero_copy_batch=True)

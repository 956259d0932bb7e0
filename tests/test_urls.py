"""URL canonicalization rules (functions/urls.py) — pinned cases."""

import pyarrow as pa
import ray.data as rd

from halvesting_geometric_ray.functions.urls import (canonicalize_urls,
                                                     canonicalize_urls_batch)

CASES = [
    ("HTTP://Example.com:80/a#frag", "http://example.com/a"),
    ("https://Example.COM:443/", "https://example.com/"),
    ("https://example.com", "https://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com:80/x", "https://example.com:80/x"),  # not default
    ("http://a.b/p?z=1&a=2#x", "http://a.b/p?z=1&a=2"),  # query kept as-is
    ("ftp://Host/Path", "ftp://host/Path"),  # path case preserved
    ("not a url", "not a url"),  # passthrough
    ("", ""),
]


def test_canonicalize_cases():
    b = pa.table({"url": [c[0] for c in CASES]})
    out = canonicalize_urls_batch(b)
    assert out.column("canonical_url").to_pylist() == [c[1] for c in CASES]


def test_canonicalize_idempotent():
    b = pa.table({"url": [c[1] for c in CASES]})
    out = canonicalize_urls_batch(b)
    assert out.column("canonical_url").to_pylist() == [c[1] for c in CASES]


def test_canonicalize_dataset_partitioned():
    urls = [f"HTTP://Host{i}.com:80/p{i}#f" for i in range(1000)]
    ds = rd.from_arrow(pa.table({"url": urls})).repartition(8)
    got = canonicalize_urls(ds).to_pandas().sort_values("url")
    assert (got.canonical_url ==
            got.url.str.replace("HTTP://Host", "http://host", regex=False)
            .str.replace(":80", "", regex=False)
            .str.replace(r"#f$", "", regex=True)).all()

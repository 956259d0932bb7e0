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


def test_dataset_fingerprint_order_and_layout_invariant():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from halvesting_geometric_ray.functions.hashing import (
        dataset_fingerprint)

    df = pd.DataFrame({"a": np.arange(100, dtype=np.int64),
                       "b": [f"s{i % 7}" for i in range(100)]})
    f1 = dataset_fingerprint(rd.from_pandas(df), ["a", "b"])
    shuf = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    f2 = dataset_fingerprint(rd.from_pandas(shuf).repartition(7),
                             ["a", "b"])
    assert f1 == f2 and f1["rows"] == 100
    # any single-row change breaks it
    df2 = df.copy()
    df2.loc[42, "b"] = "tampered"
    f3 = dataset_fingerprint(rd.from_pandas(df2), ["a", "b"])
    assert f3 != f1
    # column projection matters
    fa = dataset_fingerprint(rd.from_pandas(df), ["a"])
    assert fa != f1

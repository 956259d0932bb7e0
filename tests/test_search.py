"""Inverted-index build + BM25 query path: parity with the certified
full-scan scorer (functions/tfidf.py::bm25_scores), partition-pruned
reads, and layout invariance of the postings set."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.search import (build_index,
                                                       query_index)
from halvesting_geometric_ray.functions.tfidf import bm25_scores

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the dog barks at the quick fox again and again",
    "five quick foxes",
    "lazy afternoons with a lazy dog and a lazy cat",
    "jugs of water and a box of foxes",
]


def _docs_ds(parallelism=3):
    t = pa.table({"doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
                  "text": pa.array(DOCS)})
    return rd.from_arrow(t).repartition(parallelism)


@pytest.fixture(scope="module")
def index_dir(ray_session):
    d = "/tmp/hgr_search_idx"
    shutil.rmtree(d, ignore_errors=True)
    meta = build_index(_docs_ds(), d, num_buckets=8)
    assert meta["n_docs"] == len(DOCS)
    return d


def test_bm25_parity_with_full_scan(ray_session, index_dir):
    q = ["quick", "dog"]
    top, info = query_index(index_dir, q, k=10)
    full = bm25_scores(_docs_ds(), q).to_pandas()
    full = full[full["score"] > 0].sort_values(
        ["score", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    assert top["doc_id"].tolist() == full["doc_id"].tolist()
    np.testing.assert_allclose(top["score"].to_numpy(),
                               full["score"].to_numpy(), rtol=1e-12)


def test_reads_only_query_buckets(ray_session, index_dir):
    _, info = query_index(index_dir, ["fox"], k=3)
    assert len(info["buckets_read"]) == 1
    assert info["num_buckets"] == 8
    # the postings layer is hive-partitioned: one dir per bucket value
    bdirs = [p for p in os.listdir(os.path.join(index_dir, "postings"))
             if p.startswith("bucket=")]
    assert len(bdirs) > 1  # terms spread across several buckets


def test_topk_and_ordering(ray_session, index_dir):
    top, _ = query_index(index_dir, ["lazy", "dog", "fox"], k=2)
    assert len(top) == 2
    assert top.iloc[0]["score"] >= top.iloc[1]["score"]


def test_no_hits_and_validation(ray_session, index_dir):
    top, _ = query_index(index_dir, ["zzzunseen"], k=5)
    assert len(top) == 0
    with pytest.raises(ValueError):
        query_index(index_dir, ["", None], k=5)


def test_postings_layout_invariant(ray_session, index_dir):
    d2 = "/tmp/hgr_search_idx2"
    shutil.rmtree(d2, ignore_errors=True)
    build_index(_docs_ds(parallelism=7), d2, num_buckets=8)
    a = (rd.read_parquet(os.path.join(index_dir, "postings"))
         .to_pandas().sort_values(["term", "doc_id"])
         .reset_index(drop=True))
    b = (rd.read_parquet(os.path.join(d2, "postings"))
         .to_pandas().sort_values(["term", "doc_id"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a[["term", "doc_id", "tf", "dl"]],
                                  b[["term", "doc_id", "tf", "dl"]])

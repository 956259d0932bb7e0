"""Incremental graph extension: stable ids, layer/CSR reuse, warm-start
PageRank — checked against a full rebuild of the unioned page table."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from halvesting_geometric_ray.fixtures import ensure_pages_parquet
from halvesting_geometric_ray.graph.build import build_graph, read_layer
from halvesting_geometric_ray.graph.incremental import (extend_csr_shards,
                                                        extend_graph)
from halvesting_geometric_ray.graph.pagerank import pagerank


def _page_row(url, links):
    html = ("<html><body>" +
            "".join(f'<a href="{u}">x</a>' for u in links) +
            "</body></html>").encode()
    return {"url": url, "warc_ts": np.datetime64("2025-01-01", "us"),
            "html": html, "text": "t", "lang": "en"}


def _write_pages(rows, path):
    t = pa.Table.from_pylist(rows, schema=pa.schema([
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string())]))
    os.makedirs(path, exist_ok=True)
    pq.write_table(t, os.path.join(path, "part-0.parquet"))
    return path


def _url_edges(g):
    es = read_layer(g.edges).to_pandas()
    vs = read_layer(g.vertices).to_pandas()
    m = dict(zip(vs.vid, vs.url))
    return {(m[s], m[d]) for s, d in zip(es.src, es.dst)}


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    pages = ensure_pages_parquet(100, 42)
    wd = str(tmp_path_factory.mktemp("inc") / "g1")
    g1 = build_graph(pages, wd)
    return pages, g1


def _delta_rows(g1):
    vs = read_layer(g1.vertices).to_pandas()
    old_urls = sorted(vs.url)[:4]
    rows = []
    for i in range(6):
        links = [f"http://delta.example/p{(i + 1) % 6}", old_urls[i % 4]]
        if i == 0:
            links.append("http://delta-external.example/only-target")
        rows.append(_page_row(f"http://delta.example/p{i}", links))
    return rows


def test_extend_graph_stable_ids_and_edges(base, tmp_path):
    pages, g1 = base
    delta = _write_pages(_delta_rows(g1), str(tmp_path / "delta_pages"))
    g2 = extend_graph(g1, delta, str(tmp_path / "g2"))

    v1 = read_layer(g1.vertices).to_pandas().sort_values("vid")
    v2 = read_layer(g2.vertices).to_pandas().sort_values("vid")
    # old vids stable, old prefix of offsets unchanged
    old = v2[v2.vid < g1.num_vertices]
    assert dict(zip(old.url, old.vid)) == dict(zip(v1.url, v1.vid))
    assert list(g2.offsets[:len(g1.offsets)]) == list(g1.offsets)
    # dense, contiguous new ids
    assert sorted(v2.vid) == list(range(g2.num_vertices))
    assert g2.num_vertices == g1.num_vertices + 7  # 6 pages + 1 external

    # url-level edge set == full rebuild on the unioned page table
    union_rows = (pq.read_table(pages).to_pylist() +
                  pq.read_table(os.path.join(
                      str(tmp_path / "delta_pages"),
                      "part-0.parquet")).to_pylist())
    full_dir = _write_pages(union_rows, str(tmp_path / "union_pages"))
    g_full = build_graph(full_dir, str(tmp_path / "gfull"))
    assert _url_edges(g2) == _url_edges(g_full)
    assert g2.meta["num_edges"] == read_layer(g2.edges).count()


def test_extend_graph_idempotent_and_recrawl_filter(base, tmp_path):
    pages, g1 = base
    delta = _write_pages(_delta_rows(g1), str(tmp_path / "d"))
    g2 = extend_graph(g1, delta, str(tmp_path / "g2"))
    # extending AGAIN with the same delta: every url is now a re-crawl
    g3 = extend_graph(g2, delta, str(tmp_path / "g3"))
    assert g3.num_vertices == g2.num_vertices
    assert g3.meta["num_edges"] == g2.meta["num_edges"]
    # pure re-crawl of the ORIGINAL pages is also a no-op
    g4 = extend_graph(g2, pages, str(tmp_path / "g4"))
    assert g4.num_vertices == g2.num_vertices
    assert g4.meta["num_edges"] == g2.meta["num_edges"]


def test_extend_csr_and_warm_pagerank(base, tmp_path):
    pages, g1 = base
    wd1 = str(tmp_path / "pr1")
    ranks1, info1 = pagerank(read_layer(g1.edges), g1.offsets, wd1,
                             resume=False)
    delta = _write_pages(_delta_rows(g1), str(tmp_path / "d"))
    g2 = extend_graph(g1, delta, str(tmp_path / "g2"))

    old_csr = os.path.join(wd1, "csr")
    new_csr = str(tmp_path / "pr2" / "csr")
    assert extend_csr_shards(old_csr, new_csr, g2, len(g1.offsets) - 1)
    # old shard files are hard links (no data copied)
    s0 = "shard-00000.parquet"
    assert os.path.samefile(os.path.join(old_csr, s0),
                            os.path.join(new_csr, s0))
    mtimes = {e.name: e.stat().st_mtime_ns for e in os.scandir(new_csr)}

    # warm-started pagerank on the extended graph, adopting the cache
    wd2 = str(tmp_path / "pr2")
    ranks2, info2 = pagerank(read_layer(g2.edges), g2.offsets, wd2,
                             resume=False, warm_ranks=ranks1)
    assert info2.get("warm_start") is True
    # the shard cache was adopted, not rebuilt
    for e in os.scandir(new_csr):
        if e.name.endswith(".parquet"):
            assert mtimes[e.name] == e.stat().st_mtime_ns

    # same fixpoint as a cold run on a fresh workdir
    wd3 = str(tmp_path / "pr3")
    ranks3, info3 = pagerank(read_layer(g2.edges), g2.offsets, wd3,
                             resume=False)
    a = ranks2.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = ranks3.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(a, b, atol=1e-6)
    assert abs(a.sum() - 1.0) < 1e-6
    # warm start converges in fewer iterations than cold
    assert info2["num_iters"] < info3["num_iters"], (
        info2["num_iters"], info3["num_iters"])


def test_extend_csr_refuses_foreign_lineage(base, tmp_path):
    pages, g1 = base
    delta = _write_pages(_delta_rows(g1), str(tmp_path / "d"))
    g2 = extend_graph(g1, delta, str(tmp_path / "g2"))
    assert not extend_csr_shards(str(tmp_path / "nonexistent"),
                                 str(tmp_path / "c"), g2,
                                 len(g1.offsets) - 1)

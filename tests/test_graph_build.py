"""Graph construction conformance — reference-style golden cardinalities
(the reference's de-facto test corpus is its node/edge counts,
link_prediction_dataset.py:50-75) plus bijection/determinism properties."""

import numpy as np
import pyarrow.compute as pc
import ray.data as rd

from halvesting_geometric_ray.ops.ids import owner_of


def _vs_es(g):
    return (rd.read_parquet(g.vertices).to_pandas(),
            rd.read_parquet(g.edges).to_pandas())


def test_vertex_table_is_dense_bijection(tiny_graph, tiny_corpus):
    vs, _ = _vs_es(tiny_graph)
    assert sorted(vs.vid) == list(range(len(vs)))
    assert set(vs.url) == set(tiny_corpus.expected_vertex_urls())
    assert vs.url.is_unique


def test_vertex_parts_own_contiguous_ranges(tiny_graph):
    vs, _ = _vs_es(tiny_graph)
    off = tiny_graph.offsets
    assert (owner_of(vs.vid.to_numpy(), off) == vs.part.to_numpy()).all()


def test_edge_table_exact(tiny_graph, tiny_corpus):
    vs, es = _vs_es(tiny_graph)
    u2v = dict(zip(vs.url, vs.vid))
    exp = {(u2v[s], u2v[d]) for s, d in tiny_corpus.expected_edge_set()}
    got = list(zip(es.src, es.dst))
    assert len(got) == len(set(got))  # exact dedup
    assert set(got) == exp


def test_text_layer_byte_identical(tiny_graph, tiny_pages_dir):
    ext = rd.read_parquet(tiny_graph.extracted).to_pandas()
    pages = rd.read_parquet(tiny_pages_dir, columns=["url", "text"]).to_pandas()
    m = ext.merge(pages, on="url", suffixes=("_got", "_exp"))
    assert len(m) == len(pages)
    assert (m.text_got == m.text_exp).all()


def test_counts_small(small_graph, small_corpus):
    vs, es = _vs_es(small_graph)
    assert len(vs) == len(small_corpus.expected_vertex_urls())
    assert len(es) == len(small_corpus.expected_edge_set())


def test_ids_deterministic_across_runs(tiny_pages_dir, tmp_path):
    """Permutation/parallelism-independent ids: rebuild -> same mapping."""
    from halvesting_geometric_ray.config import EngineConfig
    from halvesting_geometric_ray.graph.build import build_graph

    g1 = build_graph(tiny_pages_dir, str(tmp_path / "a"), force=True)
    g2 = build_graph(tiny_pages_dir, str(tmp_path / "b"), force=True)
    v1 = rd.read_parquet(g1.vertices).to_pandas().sort_values("url")
    v2 = rd.read_parquet(g2.vertices).to_pandas().sort_values("url")
    assert (v1.vid.to_numpy() == v2.vid.to_numpy()).all()


def test_empty_and_degenerate_inputs(tmp_path):
    """Graceful behavior on degenerate corpora (all pages malformed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import numpy as np

    from halvesting_geometric_ray.graph.build import build_graph
    from halvesting_geometric_ray.graph.pagerank import pagerank

    d = tmp_path / "badpages"
    d.mkdir()
    t = pa.table({
        "url": pa.array([f"https://x/{i}" for i in range(10)]),
        "warc_ts": pa.array(np.zeros(10, dtype="int64"),
                            type=pa.timestamp("us")),
        "html": pa.array([b"<html><body>trunc"] * 10, type=pa.binary()),
        "text": pa.array([""] * 10),
        "lang": pa.array(["en"] * 10),
    })
    pq.write_table(t, str(d / "p.parquet"))
    g = build_graph(str(d), str(tmp_path / "wd"))
    assert g.num_vertices == 10  # page urls still become vertices
    assert g.meta["num_edges"] == 0
    ranks, info = pagerank(rd.read_parquet(g.edges), g.offsets,
                           str(tmp_path / "wd"))
    got = ranks.to_pandas()
    assert len(got) == 10
    assert abs(got["rank"].sum() - 1.0) < 1e-9  # pure dangling graph


def test_weighted_edges_match_anchor_multiplicity(tiny_graph):
    """weighted_edges (src, dst, w) mapped back to urls must equal the
    authored anchors' per-pair occurrence counts (DuckDB oracle), and
    its pair set must equal the deduped edges layer."""
    import duckdb

    from halvesting_geometric_ray.fixtures import ensure_anchors_parquet
    from halvesting_geometric_ray.graph.build import weighted_edges

    we = weighted_edges(tiny_graph).to_pandas()
    v = rd.read_parquet(tiny_graph.vertices).to_pandas()[["url", "vid"]]
    got = (we.merge(v.rename(columns={"vid": "src", "url": "src_url"}), on="src")
             .merge(v.rename(columns={"vid": "dst", "url": "dst_url"}), on="dst")
           [["src_url", "dst_url", "w"]]
           .sort_values(["src_url", "dst_url"]).reset_index(drop=True))
    anchors = ensure_anchors_parquet(100, 42)
    exp = duckdb.sql(
        f"SELECT src_url, dst_url, count(*) AS w "
        f"FROM read_parquet('{anchors}') GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    assert len(got) == len(exp)
    assert (got.src_url.to_numpy() == exp.src_url.to_numpy()).all()
    assert (got.dst_url.to_numpy() == exp.dst_url.to_numpy()).all()
    assert (got.w.to_numpy() == exp.w.to_numpy()).all()
    assert got.w.max() >= 2  # the fixture authors duplicate anchors
    # pair set == deduped edges layer
    e = rd.read_parquet(tiny_graph.edges).to_pandas()
    a = set(zip(we.src, we.dst))
    b = set(zip(e.src, e.dst))
    assert a == b

"""Host-graph contraction vs an exact DuckDB oracle on the fixture
graph layers."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.build import read_layer
from halvesting_geometric_ray.graph.hostgraph import host_graph, hosts_of


def _duck_host_edges(vdf, edf, drop_self=False):
    con = duckdb.connect()
    con.register("v", vdf)
    con.register("e", edf)
    cond = "WHERE sh <> dh" if drop_self else ""
    return con.execute(f"""
        WITH m AS (SELECT vid, string_split(url, '/')[3] AS host FROM v),
        he AS (SELECT ms.host AS sh, md.host AS dh
               FROM e JOIN m ms ON e.src = ms.vid
                      JOIN m md ON e.dst = md.vid)
        SELECT sh, dh, count(*) AS n_links FROM he {cond}
        GROUP BY sh, dh ORDER BY sh, dh
    """).fetchdf()


def _check(tiny_graph, drop_self):
    vdf = read_layer(tiny_graph.vertices).to_pandas()
    edf = read_layer(tiny_graph.edges).to_pandas()
    hv, he, h_off = host_graph(read_layer(tiny_graph.vertices),
                               read_layer(tiny_graph.edges),
                               drop_self_loops=drop_self)
    hvd = hv.to_pandas()
    hed = he.to_pandas()
    # dense host id space, covered by offsets
    assert sorted(hvd.hid) == list(range(len(hvd)))
    assert int(h_off[-1]) == len(hvd)
    assert hvd.host.is_unique
    # host universe matches the rule
    exp_hosts = set(vdf.url.str.split("/").str[2].fillna(""))
    assert set(hvd.host) == exp_hosts
    # weighted contracted edges == DuckDB
    m = dict(zip(hvd.hid, hvd.host))
    got = pd.DataFrame({
        "sh": hed.src_h.map(m), "dh": hed.dst_h.map(m),
        "n_links": hed.n_links,
    }).sort_values(["sh", "dh"]).reset_index(drop=True)
    exp = _duck_host_edges(vdf, edf, drop_self).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    return hvd, hed


def test_host_graph_matches_duckdb(tiny_graph):
    hvd, hed = _check(tiny_graph, drop_self=False)
    # fixture urls span multiple hosts and self-host links exist
    assert len(hvd) > 1
    sh = hed.src_h.to_numpy()
    dh = hed.dst_h.to_numpy()
    assert (sh == dh).any()


def test_host_graph_drop_self_loops(tiny_graph):
    _, hed = _check(tiny_graph, drop_self=True)
    assert (hed.src_h.to_numpy() != hed.dst_h.to_numpy()).all()


def test_hosts_of_rule():
    import pyarrow as pa

    urls = pa.chunked_array([pa.array([
        "http://a.example/x", "https://b.example/", "http://a.example/y/z",
        "nohost", ""])])
    got = hosts_of(urls).to_pylist()
    assert got == ["a.example", "b.example", "a.example", "", ""]


def test_host_pagerank_composes(tiny_graph, tmp_path):
    """The contracted graph feeds weighted PageRank directly."""
    from halvesting_geometric_ray.graph.pagerank import pagerank

    hv, he, h_off = host_graph(read_layer(tiny_graph.vertices),
                               read_layer(tiny_graph.edges))
    ranks, info = pagerank(he.map_batches(
        lambda b: b.rename_columns(["src", "dst", "w"]),
        batch_format="pyarrow", zero_copy_batch=True),
        h_off, str(tmp_path / "hpr"), resume=False, weight_col="w")
    df = ranks.to_pandas()
    assert len(df) == int(h_off[-1])
    assert abs(df["rank"].sum() - 1.0) < 1e-9

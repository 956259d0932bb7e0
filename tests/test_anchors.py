"""Anchor extraction + incoming-anchor aggregation vs pure oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from halvesting_geometric_ray.functions.anchors import (
    anchor_edges, anchors_one, incoming_anchors)


def _page(links):
    body = "".join(f'<a href="{h}">{t}</a>' for h, t in links)
    return f"<html><body>{body}</body></html>".encode()


def test_anchors_one_tolerant():
    assert anchors_one(_page([("u1", "hello world"),
                              ("u2", " spaced  out ")])) == [
        ("u1", "hello world"), ("u2", "spaced out")]
    assert anchors_one(b"\xff\xfe broken") == []
    assert anchors_one(b"<html><a href='u'>x</a>") == []  # truncated
    assert anchors_one(_page([])) == []


def test_anchor_edges_and_incoming():
    pages = [
        ("p0", _page([("t1", "alpha link"), ("t2", "beta")])),
        ("p1", _page([("t1", "alpha link"), ("t1", "gamma")])),
        ("p2", _page([("t1", "alpha link")])),
    ]
    ds = rd.from_arrow(pa.table({
        "url": pa.array([u for u, _ in pages]),
        "html": pa.array([h for _, h in pages], type=pa.binary())}))
    edges = anchor_edges(ds)
    e = edges.to_pandas()
    assert len(e) == 5
    got = (incoming_anchors(edges, top_k=2).to_pandas()
           .set_index("dst").sort_index())
    assert got.loc["t1", "n_links"] == 4
    assert got.loc["t1", "n_anchors"] == 2
    assert got.loc["t1", "top_anchors"] == "alpha link | gamma"
    assert got.loc["t2", "n_links"] == 1
    assert got.loc["t2", "top_anchors"] == "beta"


def test_incoming_partitioning_invariance():
    rng = np.random.default_rng(3)
    pages = []
    for i in range(60):
        links = [(f"t{rng.integers(0, 10)}",
                  f"phrase {rng.integers(0, 5)}")
                 for _ in range(rng.integers(0, 6))]
        pages.append((f"p{i}", _page(links)))
    tbl = pa.table({"url": pa.array([u for u, _ in pages]),
                    "html": pa.array([h for _, h in pages],
                                     type=pa.binary())})
    a = (incoming_anchors(anchor_edges(
        rd.from_arrow(tbl).repartition(1))).to_pandas()
        .sort_values("dst").reset_index(drop=True))
    b = (incoming_anchors(anchor_edges(
        rd.from_arrow(tbl).repartition(7))).to_pandas()
        .sort_values("dst").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)

"""Distributed random walks: validity, determinism, layout independence,
coverage uniformity, restart semantics."""

import numpy as np
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.walks import random_walks


def _walks_df(g, tmp, tag, **kw):
    ds, info = random_walks(rd.read_parquet(g.edges), g.offsets,
                            str(tmp / tag), **kw)
    df = ds.to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    return df, info


def _edge_set(g):
    es = rd.read_parquet(g.edges).to_pandas()
    return set(zip(es.src.tolist(), es.dst.tolist()))


def test_walks_are_paths(tiny_graph, tmp_path):
    df, info = _walks_df(tiny_graph, tmp_path, "w", walk_len=8, seed=7)
    edges = _edge_set(tiny_graph)
    n = tiny_graph.num_vertices
    assert info["n_walks"] == n
    # step 0 of walk i is vertex i
    s0 = df[df.step == 0]
    assert (s0.walk_id.to_numpy() == s0.vid.to_numpy()).all()
    assert len(s0) == n
    # every consecutive visit pair is a real edge
    for wid, grp in df.groupby("walk_id"):
        v = grp.sort_values("step").vid.to_numpy()
        st = grp.sort_values("step").step.to_numpy()
        assert (st == np.arange(len(st))).all()  # contiguous steps
        for a, b in zip(v, v[1:]):
            assert (a, b) in edges, (wid, a, b)


def test_walks_end_at_dangling(tiny_graph, tmp_path):
    """A walk shorter than walk_len must end at an out-degree-0 vertex."""
    df, _ = _walks_df(tiny_graph, tmp_path, "d", walk_len=8, seed=7)
    es = rd.read_parquet(tiny_graph.edges).to_pandas()
    outdeg = np.zeros(tiny_graph.num_vertices, dtype=np.int64)
    np.add.at(outdeg, es.src.to_numpy(), 1)
    for wid, grp in df.groupby("walk_id"):
        v = grp.sort_values("step").vid.to_numpy()
        if len(v) < 8:
            assert outdeg[v[-1]] == 0, (wid, v[-1])
        else:
            assert len(v) == 8


def test_walks_layout_independent(tiny_graph, tmp_path):
    ref = None
    for na in (1, 3, 0):
        df, _ = _walks_df(tiny_graph, tmp_path, f"l{na}", walk_len=6,
                          seed=3, num_actors=na,
                          shards_dir=str(tmp_path / f"l{na}" / "csr"))
        cur = df[["walk_id", "step", "vid"]].to_numpy()
        if ref is None:
            ref = cur
        else:
            assert (ref == cur).all()


def test_walks_seed_changes_draws(tiny_graph, tmp_path):
    a, _ = _walks_df(tiny_graph, tmp_path, "s1", walk_len=6, seed=1)
    b, _ = _walks_df(tiny_graph, tmp_path, "s2", walk_len=6, seed=2)
    assert not a.equals(b)


def test_walks_per_vertex_and_explicit_starts(tiny_graph, tmp_path):
    starts = np.array([0, 5, 9], dtype=np.int64)
    df, info = _walks_df(tiny_graph, tmp_path, "x", starts=starts,
                         walks_per_vertex=4, walk_len=3, seed=11)
    assert info["n_walks"] == 12
    s0 = df[df.step == 0].sort_values("walk_id")
    assert (s0.vid.to_numpy() == np.repeat(starts, 4)).all()


def test_walks_first_step_uniform():
    """On a star graph (center -> 200 leaves) the hash-draw first step
    must cover the leaves roughly uniformly."""
    import pyarrow as pa
    from halvesting_geometric_ray.graph.walks import random_walks

    L = 200
    edges = rd.from_arrow(pa.table({
        "src": np.zeros(L, dtype=np.int64),
        "dst": np.arange(1, L + 1, dtype=np.int64)}))
    offsets = np.array([0, L + 1], dtype=np.int64)
    n_walks = 20000
    ds, _ = random_walks(edges, offsets, "/tmp/hgr_walk_star",
                         starts=np.zeros(n_walks, dtype=np.int64),
                         walk_len=2, seed=5,
                         shards_dir="/tmp/hgr_walk_star/csr")
    df = ds.to_pandas()
    hits = df[df.step == 1].vid.value_counts()
    assert len(hits) == L  # every leaf reached
    # chi-square-ish bound: expected 100 per leaf, sd 10
    assert hits.min() > 50 and hits.max() < 160, (hits.min(), hits.max())


def test_walks_restart(tiny_graph, tmp_path):
    df, _ = _walks_df(tiny_graph, tmp_path, "r", walk_len=5, seed=9,
                      restart_prob=1.0)
    # restart_prob=1: every step teleports to the start vertex
    for wid, grp in df.groupby("walk_id"):
        v = grp.sort_values("step").vid.to_numpy()
        assert len(v) == 5
        assert (v == v[0]).all()


def test_walks_validation(tiny_graph, tmp_path):
    with pytest.raises(ValueError):
        random_walks(rd.read_parquet(tiny_graph.edges), tiny_graph.offsets,
                     str(tmp_path / "v"), walk_len=0)
    with pytest.raises(ValueError):
        random_walks(rd.read_parquet(tiny_graph.edges), tiny_graph.offsets,
                     str(tmp_path / "v"), restart_prob=1.5)
    with pytest.raises(ValueError):
        random_walks(rd.read_parquet(tiny_graph.edges), tiny_graph.offsets,
                     str(tmp_path / "v"),
                     starts=np.array([tiny_graph.num_vertices]))

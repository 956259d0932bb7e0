"""Topological levels vs an exact longest-path oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.toposort import topological_levels


def longest_path_levels(n: int, src: np.ndarray, dst: np.ndarray):
    """DP over Kahn order; returns per-vertex longest path from any
    source (None if cyclic)."""
    indeg = np.bincount(dst, minlength=n)
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[a].append(b)
    level = np.zeros(n, dtype=np.int64)
    frontier = list(np.flatnonzero(indeg == 0))
    seen = 0
    while frontier:
        v = frontier.pop()
        seen += 1
        for w in adj[v]:
            level[w] = max(level[w], level[v] + 1)
            indeg[w] -= 1
            if indeg[w] == 0:
                frontier.append(w)
    return level if seen == n else None


def _run(n, src, dst, tmp, tag, num_parts=1, **kw):
    edges = rd.from_pandas(pd.DataFrame({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64)}))
    offsets = (np.array([0, n], dtype=np.int64) if num_parts == 1 else
               np.unique(np.linspace(0, n, num_parts + 1).astype(np.int64)))
    ds, info = topological_levels(edges, offsets, str(tmp / tag), **kw)
    got = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(got) == n
    return got, info


def test_chain_and_diamond(tmp_path):
    # chain 0->1->2->3 plus diamond 0->4->3 (3 takes the LONGER path)
    got, info = _run(5, [0, 1, 2, 0, 4], [1, 2, 3, 4, 3], tmp_path, "d")
    assert got.level.tolist() == [0, 1, 2, 3, 1]
    assert info["depth"] == 3


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_dag_matches_oracle(tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = 200
    m = np.triu(rng.random((n, n)) < 0.03, k=1)  # i < j only: acyclic
    src, dst = np.nonzero(m)
    exp = longest_path_levels(n, src, dst)
    for parts in (1, 5):
        got, _ = _run(n, src, dst, tmp_path, f"r{seed}p{parts}",
                      num_parts=parts)
        assert (got.level.to_numpy() == exp).all(), parts


def test_cycle_raises(tmp_path):
    with pytest.raises(ValueError, match="cycle"):
        _run(4, [0, 1, 2], [1, 2, 0], tmp_path, "cyc")
    with pytest.raises(ValueError, match="cycle"):  # self-loop
        _run(2, [0, 1], [1, 1], tmp_path, "self")


def test_condensation_then_toposort(tmp_path):
    """The documented cyclic-graph pipeline: SCC -> condensation ->
    levels over the DAG (isolated/non-label vids land at level 0)."""
    from halvesting_geometric_ray.graph.scc import (
        condensation, strongly_connected_components)

    # cycle {0,1} -> 2 -> cycle {3,4} -> 5
    src = [0, 1, 1, 2, 3, 4, 4]
    dst = [1, 0, 2, 3, 4, 3, 5]
    n = 6
    edges = rd.from_pandas(pd.DataFrame({
        "src": np.array(src, dtype=np.int64),
        "dst": np.array(dst, dtype=np.int64)}))
    offsets = np.array([0, n], dtype=np.int64)
    labels, _ = strongly_connected_components(edges, offsets,
                                              str(tmp_path / "s"))
    cond = condensation(edges, labels.select_columns(["vid", "scc"]))
    lv, info = topological_levels(
        cond.select_columns(["src_scc", "dst_scc"]).map_batches(
            lambda b: b.rename_columns(["src", "dst"]),
            batch_format="pyarrow"),
        offsets, str(tmp_path / "t"), lineage={"kind": "cond"})
    got = lv.to_pandas().set_index("vid").level
    # SCC labels: {0,1}->1, {2}->2, {3,4}->4, {5}->5
    assert got[1] == 0 and got[2] == 1 and got[4] == 2 and got[5] == 3
    assert info["depth"] == 3

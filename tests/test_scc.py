"""Strongly connected components vs an exact Tarjan oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.scc import strongly_connected_components


def tarjan_max_labels(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Iterative Tarjan; returns per-vertex label = MAX member vid of
    its SCC (the engine's canonical labeling)."""
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[a].append(b)
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on = np.zeros(n, dtype=bool)
    label = np.full(n, -1, dtype=np.int64)
    stack, counter = [], [0]
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if on[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on[w] = False
                    comp.append(w)
                    if w == v:
                        break
                label[np.array(comp)] = max(comp)
            work.pop()
            if work:
                u = work[-1][0]
                low[u] = min(low[u], low[v])
    return label


def _run(n, src, dst, tmp, tag, num_parts=1, **kw):
    edges = rd.from_pandas(pd.DataFrame({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64)}))
    if num_parts == 1:
        offsets = np.array([0, n], dtype=np.int64)
    else:
        cuts = np.linspace(0, n, num_parts + 1).astype(np.int64)
        offsets = np.unique(cuts)
    ds, info = strongly_connected_components(edges, offsets,
                                             str(tmp / tag), **kw)
    got = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(got) == n
    return got, info


def test_scc_crafted(tmp_path):
    # cycle {1,2,3} -> cycle {4,5}; DAG chain 0 -> 1; self-loop 6;
    # isolated 7
    src = [1, 2, 3, 3, 4, 5, 0, 6]
    dst = [2, 3, 1, 4, 5, 4, 1, 6]
    got, info = _run(8, src, dst, tmp_path, "c")
    exp = tarjan_max_labels(8, np.array(src), np.array(dst))
    assert (got.scc.to_numpy() == exp).all()
    # labels are the max member vid: {1,2,3}->3, {4,5}->5, singletons self
    assert got.scc.tolist() == [0, 3, 3, 3, 5, 5, 6, 7]
    assert info["n_sccs"] == 5


def test_scc_pure_cycle_and_chain(tmp_path):
    n = 40
    # one big cycle: a single SCC labeled n-1
    src = np.arange(n)
    dst = (src + 1) % n
    got, info = _run(n, src, dst, tmp_path, "cyc", num_parts=4)
    assert (got.scc.to_numpy() == n - 1).all()
    assert info["n_sccs"] == 1
    # pure chain (DAG): all singletons, drained by trim alone
    got, info = _run(n, np.arange(n - 1), np.arange(1, n), tmp_path, "chain",
                     num_parts=4)
    assert (got.scc.to_numpy() == np.arange(n)).all()
    assert info["n_sccs"] == n
    assert all("color_rounds" not in r for r in info["rounds"])


@pytest.mark.parametrize("seed,p", [(0, 0.02), (1, 0.05), (2, 0.1),
                                    (3, 0.01), (4, 0.15)])
def test_scc_random_matches_tarjan(tmp_path, seed, p):
    rng = np.random.default_rng(seed)
    n = 120
    m = rng.random((n, n)) < p
    src, dst = np.nonzero(m)
    got, _ = _run(n, src, dst, tmp_path, f"r{seed}", num_parts=3)
    exp = tarjan_max_labels(n, src, dst)
    assert (got.scc.to_numpy() == exp).all()


def test_scc_partitioning_and_actor_independent(tmp_path):
    rng = np.random.default_rng(99)
    n = 150
    m = rng.random((n, n)) < 0.03
    src, dst = np.nonzero(m)
    exp = tarjan_max_labels(n, src, dst)
    for parts, actors in [(1, 0), (4, 0), (7, 2), (4, 3)]:
        got, _ = _run(n, src, dst, tmp_path, f"p{parts}a{actors}",
                      num_parts=parts, num_actors=actors)
        assert (got.scc.to_numpy() == exp).all(), (parts, actors)


def test_condensation_matches_oracle(tmp_path):
    from halvesting_geometric_ray.graph.scc import condensation

    rng = np.random.default_rng(7)
    n = 100
    m = rng.random((n, n)) < 0.06
    src, dst = np.nonzero(m)
    edges = rd.from_pandas(pd.DataFrame({
        "src": src.astype(np.int64), "dst": dst.astype(np.int64)}))
    offsets = np.array([0, 40, n], dtype=np.int64)
    labels, _ = strongly_connected_components(edges, offsets,
                                              str(tmp_path / "cond"))
    got = condensation(edges, labels.select_columns(["vid", "scc"])) \
        .to_pandas().sort_values(["src_scc", "dst_scc"]).reset_index(drop=True)

    lab = tarjan_max_labels(n, src, dst)
    df = pd.DataFrame({"a": lab[src], "b": lab[dst]})
    exp = (df[df.a != df.b].groupby(["a", "b"]).size()
           .reset_index(name="n_edges")
           .rename(columns={"a": "src_scc", "b": "dst_scc"})
           .sort_values(["src_scc", "dst_scc"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the condensation is a DAG: SCC of it is all singletons
    ids = np.unique(np.concatenate([got.src_scc, got.dst_scc]))
    remap = {v: i for i, v in enumerate(ids)}
    cl = tarjan_max_labels(len(ids),
                           got.src_scc.map(remap).to_numpy(),
                           got.dst_scc.map(remap).to_numpy())
    assert len(np.unique(cl)) == len(ids)


def test_scc_two_cliques_one_bridge(tmp_path):
    # two complete digraphs (each one SCC) joined by a one-way bridge
    k = 8
    a = np.arange(k)
    s1, d1 = np.meshgrid(a, a)
    keep = s1 != d1
    src = np.concatenate([s1[keep], s1[keep] + k, [k - 1]])
    dst = np.concatenate([d1[keep], d1[keep] + k, [k]])
    got, info = _run(2 * k, src, dst, tmp_path, "cl", num_parts=2)
    exp = tarjan_max_labels(2 * k, src, dst)
    assert (got.scc.to_numpy() == exp).all()
    assert info["n_sccs"] == 2
    sizes = got.groupby("scc").size()
    assert sorted(sizes.tolist()) == [k, k]

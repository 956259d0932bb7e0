"""Monte-Carlo PageRank (graph/walks.py::pagerank_mc): estimator
accuracy vs the exact engine on a dangling-free graph, layout/
determinism, validation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.walks import pagerank_mc


def _dangling_free_graph(n=150, out_deg=4, seed=3):
    """Every vertex has exactly out_deg out-neighbors -> no dangling
    bias; skewed targets (preferential-ish) so ranks spread."""
    rng = np.random.default_rng(seed)
    src = np.repeat(np.arange(n, dtype=np.int64), out_deg)
    # bias targets toward low ids for a heavy head
    dst = (rng.random(n * out_deg) ** 2 * n).astype(np.int64)
    m = src != dst
    src, dst = src[m], dst[m]
    # dedup pairs (simple-graph contract)
    key = src * n + dst
    _, ix = np.unique(key, return_index=True)
    src, dst = src[ix], dst[ix]
    # ensure no dangling (every vertex appears as src at least once):
    # construction guarantees it unless dedup+selfloop removal emptied
    # a vertex; assert in test
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    return rd.from_arrow(t), (src, dst), n


def _exact_pagerank(src, dst, n, d=0.85, iters=200):
    """Reference fixpoint WITHOUT dangling handling (graph is
    dangling-free) and restart-to-uniform."""
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / outdeg[src])
        r = (1.0 - d) / n + d * contrib
    return r / r.sum()


def test_estimates_exact_ranks(tmp_path):
    edges, (src, dst), n = _dangling_free_graph()
    assert np.unique(src).size == n  # dangling-free precondition
    offsets = np.array([0, n // 2, n], dtype=np.int64)
    ds, info = pagerank_mc(edges, offsets, str(tmp_path / "mc"),
                           walks_per_vertex=64, walk_len=32, seed=11)
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(df) == n  # step-0 visits cover every vertex
    got = df.rank_mc.to_numpy()
    want = _exact_pagerank(src, dst, n)
    assert abs(got.sum() - 1.0) < 1e-12
    # MC accuracy: strong rank correlation + bounded L1
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.97, corr
    assert np.abs(got - want).sum() < 0.08, np.abs(got - want).sum()
    # top-10 sets mostly agree
    top_got = set(np.argsort(got)[-10:])
    top_want = set(np.argsort(want)[-10:])
    assert len(top_got & top_want) >= 8, (top_got, top_want)


def test_layout_deterministic(tmp_path):
    edges, _, n = _dangling_free_graph(seed=7)
    got = []
    for tag, cuts, na in (("a", [0, n], 1), ("b", [0, 40, 90, n], 3)):
        ds, _ = pagerank_mc(edges, np.array(cuts, dtype=np.int64),
                            str(tmp_path / tag), walks_per_vertex=8,
                            walk_len=16, seed=5, num_actors=na)
        got.append(ds.to_pandas().sort_values("vid")
                   .reset_index(drop=True))
    assert (got[0].vid.to_numpy() == got[1].vid.to_numpy()).all()
    assert (got[0].rank_mc.to_numpy() == got[1].rank_mc.to_numpy()).all()


def test_validation(tmp_path):
    edges, _, n = _dangling_free_graph(seed=9)
    off = np.array([0, n], dtype=np.int64)
    with pytest.raises(ValueError, match="damping"):
        pagerank_mc(edges, off, str(tmp_path), damping=1.0)
    with pytest.raises(ValueError, match="walks_per_vertex"):
        pagerank_mc(edges, off, str(tmp_path), walks_per_vertex=0)

"""k-core extraction vs exact single-process peeling oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from halvesting_geometric_ray.graph.build import symmetrize
from halvesting_geometric_ray.graph.kcore import k_core


def kcore_oracle(n: int, src: np.ndarray, dst: np.ndarray,
                 k: int) -> np.ndarray:
    """Exact peeling over the undirected simple graph on (src, dst)."""
    a, b = np.concatenate([src, dst]), np.concatenate([dst, src])
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    a, b = pairs[:, 0], pairs[:, 1]
    deg = np.bincount(a, minlength=n)
    alive = np.ones(n, dtype=bool)
    while True:
        dying = alive & (deg < k)
        if not dying.any():
            return alive
        alive &= ~dying
        m = dying[a]
        deg -= np.bincount(b[m], minlength=n)


def _sym(g):
    return symmetrize(rd.read_parquet(g.edges))


def test_kcore_matches_oracle(tiny_graph, tmp_path):
    es = rd.read_parquet(tiny_graph.edges).to_pandas()
    src, dst = es.src.to_numpy(), es.dst.to_numpy()
    sym = _sym(tiny_graph)
    for k in (1, 2, 3):
        exp = kcore_oracle(tiny_graph.num_vertices, src, dst, k)
        ds, info = k_core(sym, tiny_graph.offsets, k,
                          str(tmp_path / f"kc{k}"))
        got = ds.to_pandas().sort_values("vid")
        assert (got.in_kcore.to_numpy() == exp).all(), k
        assert info["core_size"] == int(exp.sum())
        assert info["iters"][-1]["killed"] == 0  # converged
        # residual degrees of survivors are >= k and exact
        core = set(np.nonzero(exp)[0])
        if core:
            pairs = {(int(s), int(d)) for s, d in zip(src, dst)
                     if s in core and d in core and s != d}
            und = pairs | {(d, s) for s, d in pairs}
            cdeg = np.zeros(tiny_graph.num_vertices, dtype=np.int64)
            for s, _ in und:
                cdeg[s] += 1
            g2 = got.set_index("vid")
            for v in core:
                assert g2.loc[v, "core_degree"] == cdeg[v]
                assert cdeg[v] >= k


def test_kcore_partitioning_independent(tiny_graph, tmp_path):
    """Membership must not depend on the actor layout."""
    sym = _sym(tiny_graph)
    a, _ = k_core(sym, tiny_graph.offsets, 2, str(tmp_path / "a"))
    b, _ = k_core(sym, tiny_graph.offsets, 2, str(tmp_path / "b"),
                  num_actors=1)
    pa_ = a.to_pandas().sort_values("vid").reset_index(drop=True)
    pb = b.to_pandas().sort_values("vid").reset_index(drop=True)
    assert pa_.equals(pb)


def test_kcore_known_shape(tmp_path, ray_session):
    """Hand-built graph: a 4-clique with a pendant path. The 3-core is
    exactly the clique; the 2-core too (path peels off); 1-core is all."""
    # clique 0-1-2-3, path 3-4-5
    src = np.array([0, 0, 0, 1, 1, 2, 3, 4], dtype=np.int64)
    dst = np.array([1, 2, 3, 2, 3, 3, 4, 5], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    offsets = np.array([0, 3, 6], dtype=np.int64)  # 2 partitions
    sym = symmetrize(edges)
    for k, expect in ((1, {0, 1, 2, 3, 4, 5}), (2, {0, 1, 2, 3}),
                      (3, {0, 1, 2, 3}), (4, set())):
        ds, info = k_core(sym, offsets, k, str(tmp_path / f"k{k}"))
        got = ds.to_pandas()
        assert set(got[got.in_kcore].vid) == expect, k
        assert info["core_size"] == len(expect)

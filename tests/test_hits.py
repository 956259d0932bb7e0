"""HITS hubs/authorities vs a NumPy power-iteration oracle."""

import numpy as np
import ray.data as rd

from halvesting_geometric_ray.graph.hits import hits


def hits_oracle(n, src, dst, tol=1e-8, max_iters=100):
    a = np.full(n, 1.0 / np.sqrt(n))
    h = np.full(n, 1.0 / np.sqrt(n))
    a_prev = None
    iters = 0
    for _ in range(max_iters):
        iters += 1
        a_new = np.zeros(n)
        np.add.at(a_new, dst, h[src])
        nrm = np.linalg.norm(a_new)
        a_new = a_new / nrm if nrm > 0 else a_new
        delta = np.abs(a_new - a_prev).sum() if a_prev is not None \
            else np.inf
        a_prev = a_new
        h_new = np.zeros(n)
        np.add.at(h_new, src, a_new[dst])
        nrm = np.linalg.norm(h_new)
        h_new = h_new / nrm if nrm > 0 else h_new
        a, h = a_new, h_new
        if delta < tol:
            break
    return a, h, iters


def _run(g, tmp_path, **kw):
    edges = rd.read_parquet(g.edges)
    return hits(edges, g.offsets, workdir=str(tmp_path / "hits"), **kw)


def test_hits_matches_oracle_tiny(tiny_graph, tmp_path):
    es = rd.read_parquet(tiny_graph.edges).to_pandas()
    n = tiny_graph.num_vertices
    exp_a, exp_h, exp_iters = hits_oracle(n, es.src.to_numpy(),
                                          es.dst.to_numpy())
    ds, info = _run(tiny_graph, tmp_path)
    got = ds.to_pandas().sort_values("vid")
    assert info["converged"]
    assert info["num_iters"] == exp_iters
    assert np.allclose(got.authority.to_numpy(), exp_a, rtol=0, atol=1e-6)
    assert np.allclose(got.hub.to_numpy(), exp_h, rtol=0, atol=1e-6)


def test_hits_matches_oracle_small(small_graph, tmp_path):
    es = rd.read_parquet(small_graph.edges).to_pandas()
    n = small_graph.num_vertices
    exp_a, exp_h, _ = hits_oracle(n, es.src.to_numpy(), es.dst.to_numpy())
    ds, info = _run(small_graph, tmp_path)
    got = ds.to_pandas().sort_values("vid")
    assert np.allclose(got.authority.to_numpy(), exp_a, rtol=0, atol=1e-6)
    assert np.allclose(got.hub.to_numpy(), exp_h, rtol=0, atol=1e-6)

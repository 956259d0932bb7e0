"""Eigenvector centrality vs a dense NumPy power-iteration oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.eigenvector import \
    eigenvector_centrality


def eig_oracle(n, src, dst, tol, max_iters=500, w=None):
    """Same iteration on a dense matrix, INCLUDING the engine's
    one-round-trailing L1 convergence check: x' = A^T x / ||A^T x||_2
    from x = 1/sqrt(n); stop when ||x_{k-1} - x_{k-2}||_1 < tol.
    Returns (x, num_iters)."""
    A = np.zeros((n, n))
    if w is None:
        np.add.at(A, (np.asarray(src), np.asarray(dst)), 1.0)
    else:
        np.add.at(A, (np.asarray(src), np.asarray(dst)), np.asarray(w))
    x_mm = np.full(n, 1.0 / np.sqrt(n))  # x_{k-2}
    y = x_mm.copy()                       # raw y_{k-1} (unit at k=0)
    for k in range(1, max_iters + 1):
        inv = 1.0 / np.linalg.norm(y)
        x_now = y * inv                   # x_{k-1}
        l1 = np.abs(x_now - x_mm).sum()
        y = (A.T @ y) * inv               # raw y_k = A^T x_{k-1}
        x_mm = x_now
        if k >= 2 and l1 < tol:
            return y / np.linalg.norm(y), k
    raise AssertionError("oracle did not converge")


def _run(n, src, dst, tmp, tag, num_parts=1, **kw):
    df = {"src": np.asarray(src, dtype=np.int64),
          "dst": np.asarray(dst, dtype=np.int64)}
    if "weight_col" in kw:
        df[kw["weight_col"]] = np.asarray(kw.pop("_w"), dtype=np.float64)
    edges = rd.from_pandas(pd.DataFrame(df))
    offsets = (np.array([0, n], dtype=np.int64) if num_parts == 1 else
               np.unique(np.linspace(0, n, num_parts + 1).astype(np.int64)))
    ds, info = eigenvector_centrality(edges, offsets, str(tmp / tag), **kw)
    got = ds.to_pandas().set_index("vid").eigenvector.sort_index()
    return got, info


def test_cycle_uniform(tmp_path):
    # directed 6-cycle: principal eigenvector is uniform, unit L2
    n = 6
    src = np.arange(n)
    dst = (src + 1) % n
    got, info = _run(n, src, dst, tmp_path, "cyc", tol=1e-12)
    assert info["converged"]
    assert np.allclose(got.to_numpy(), 1.0 / np.sqrt(n), atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1])
def test_random_matches_oracle(tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = 120
    m = rng.random((n, n)) < 0.05
    np.fill_diagonal(m, False)
    src, dst = np.nonzero(m)
    exp, exp_iters = eig_oracle(n, src, dst, 1e-9)
    for parts in (1, 4):
        got, info = _run(n, src, dst, tmp_path, f"r{seed}p{parts}",
                         num_parts=parts, tol=1e-9)
        assert info["converged"]
        assert info["num_iters"] == exp_iters, parts
        assert np.allclose(got.to_numpy(), exp, atol=1e-8), parts
        assert np.isclose((got.to_numpy() ** 2).sum(), 1.0)


def test_weighted_matches_oracle(tmp_path):
    rng = np.random.default_rng(7)
    n = 60
    m = rng.random((n, n)) < 0.08
    np.fill_diagonal(m, False)
    src, dst = np.nonzero(m)
    w = rng.uniform(0.2, 2.0, src.size)
    exp, _ = eig_oracle(n, src, dst, 1e-9, w=w)
    got, info = _run(n, src, dst, tmp_path, "w", num_parts=3,
                     tol=1e-9, weight_col="w", _w=w)
    assert info["converged"]
    assert np.allclose(got.to_numpy(), exp, atol=1e-8)


def test_no_inlinks_raises(tmp_path):
    # 2 vertices, 0 edges: A^T x == 0 -> undefined, must raise
    edges = rd.from_pandas(pd.DataFrame(
        {"src": pd.Series([], dtype="int64"),
         "dst": pd.Series([], dtype="int64")}))
    offsets = np.array([0, 2], dtype=np.int64)
    with pytest.raises(ValueError, match="zero in-degree"):
        eigenvector_centrality(edges, offsets, str(tmp_path / "z"))


def test_empty_graph(tmp_path):
    edges = rd.from_pandas(pd.DataFrame(
        {"src": pd.Series([], dtype="int64"),
         "dst": pd.Series([], dtype="int64")}))
    offsets = np.array([0], dtype=np.int64)
    ds, info = eigenvector_centrality(edges, offsets, str(tmp_path / "e"))
    assert info["converged"] and ds.count() == 0

"""Katz centrality vs a dense NumPy power-series oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.katz import katz


def katz_oracle(n, src, dst, alpha, beta, tol, max_iters=500, w=None):
    """Same fixpoint iteration on a dense matrix: x' = beta + alpha A^T x
    from x = beta.  Returns (x, num_iters)."""
    A = np.zeros((n, n))
    if w is None:
        np.add.at(A, (np.asarray(src), np.asarray(dst)), 1.0)
    else:
        np.add.at(A, (np.asarray(src), np.asarray(dst)), np.asarray(w))
    x = np.full(n, beta, dtype=np.float64)
    for k in range(1, max_iters + 1):
        new = beta + alpha * (A.T @ x)
        l1 = np.abs(new - x).sum()
        x = new
        if l1 < tol:
            return x, k
    raise AssertionError("oracle did not converge")


def _run(n, src, dst, tmp, tag, num_parts=1, **kw):
    df = {"src": np.asarray(src, dtype=np.int64),
          "dst": np.asarray(dst, dtype=np.int64)}
    if "weight_col" in kw:
        df[kw["weight_col"]] = np.asarray(kw.pop("_w"), dtype=np.float64)
    edges = rd.from_pandas(pd.DataFrame(df))
    offsets = (np.array([0, n], dtype=np.int64) if num_parts == 1 else
               np.unique(np.linspace(0, n, num_parts + 1).astype(np.int64)))
    ds, info = katz(edges, offsets, str(tmp / tag), **kw)
    got = ds.to_pandas().set_index("vid").katz.sort_index()
    return got, info


def test_star_closed_form(tmp_path):
    # leaves 1..4 point at center 0: x(leaf) = beta,
    # x(center) = beta + 4 * alpha * beta (series terminates: no paths
    # of length >= 2)
    got, info = _run(5, [1, 2, 3, 4], [0, 0, 0, 0], tmp_path, "star",
                     alpha=0.1, beta=2.0)
    assert info["converged"]
    assert np.allclose(got.loc[[1, 2, 3, 4]], 2.0)
    assert np.isclose(got.loc[0], 2.0 + 4 * 0.1 * 2.0)


@pytest.mark.parametrize("seed", [0, 1])
def test_random_matches_oracle(tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = 120
    m = rng.random((n, n)) < 0.05
    np.fill_diagonal(m, False)
    src, dst = np.nonzero(m)
    alpha = 0.08
    exp, exp_iters = katz_oracle(n, src, dst, alpha, 1.0, 1e-9)
    for parts in (1, 4):
        got, info = _run(n, src, dst, tmp_path, f"r{seed}p{parts}",
                         num_parts=parts, alpha=alpha, tol=1e-9)
        assert info["converged"]
        assert info["num_iters"] == exp_iters, parts
        assert np.allclose(got.to_numpy(), exp, atol=1e-8), parts


def test_weighted_matches_oracle(tmp_path):
    rng = np.random.default_rng(7)
    n = 60
    m = rng.random((n, n)) < 0.06
    np.fill_diagonal(m, False)
    src, dst = np.nonzero(m)
    w = rng.uniform(0.2, 2.0, src.size)
    exp, _ = katz_oracle(n, src, dst, 0.05, 1.0, 1e-9, w=w)
    got, info = _run(n, src, dst, tmp_path, "w", num_parts=3,
                     alpha=0.05, tol=1e-9, weight_col="w", _w=w)
    assert info["converged"]
    assert np.allclose(got.to_numpy(), exp, atol=1e-8)


def test_normalize_unit_l2(tmp_path):
    got, _ = _run(5, [1, 2, 3, 4], [0, 0, 0, 0], tmp_path, "norm",
                  alpha=0.1, normalize=True)
    assert np.isclose((got.to_numpy() ** 2).sum(), 1.0)


def test_divergence_guard(tmp_path):
    # K8 complete digraph: lambda_max = 7, alpha = 0.5 diverges fast
    n = 8
    src, dst = np.nonzero(~np.eye(n, dtype=bool))
    with pytest.raises(ValueError, match="diverging"):
        _run(n, src, dst, tmp_path, "div", alpha=0.5, max_iters=200)


def test_validation(tmp_path):
    edges = rd.from_pandas(pd.DataFrame({"src": [0], "dst": [1]}))
    offsets = np.array([0, 2], dtype=np.int64)
    with pytest.raises(ValueError, match="alpha"):
        katz(edges, offsets, str(tmp_path / "v"), alpha=1.5)
    with pytest.raises(ValueError, match="beta"):
        katz(edges, offsets, str(tmp_path / "v2"), beta=0.0)

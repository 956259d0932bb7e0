"""Wedge-sampling triangle estimator: exact-count accuracy envelope,
degenerate graphs, fixed-layout bitwise determinism, estimator
identities (kappa = 1 on a clique; 0 on triangle-free graphs)."""

import numpy as np
import pytest

from halvesting_geometric_ray.config import DEFAULT
from halvesting_geometric_ray.graph.apxtriangles import approx_triangles

from tests.test_louvain import _edges_ds, _offsets, clique_edges
from tests.test_spectral import random_pairs


def exact_counts(n, pairs):
    a = np.zeros((n, n))
    for u, v in pairs:
        a[u, v] = a[v, u] = 1.0
    tri = np.trace(a @ a @ a) / 6.0
    d = a.sum(axis=1)
    wedges = float((d * (d - 1)).sum() / 2.0)
    return tri, wedges


@pytest.mark.parametrize("seed", [1, 7])
def test_accuracy_vs_exact(tmp_path, seed):
    n = 120
    pairs = random_pairs(n, 0.08, seed)
    tri, wedges = exact_counts(n, pairs)
    k = 20_000
    info, _ = approx_triangles(
        _edges_ds(pairs), _offsets(n), str(tmp_path / f"s{seed}"),
        DEFAULT, k_samples=k, seed=5)
    assert info["n_wedges"] == wedges
    kappa_true = 3.0 * tri / wedges
    # 5-sigma envelope on the binomial kappa estimate
    tol = 5.0 * np.sqrt(kappa_true * (1 - kappa_true) / k)
    assert abs(info["kappa"] - kappa_true) < tol
    assert abs(info["triangles_est"] - tri) < tol * wedges / 3.0


def test_clique_kappa_one(tmp_path):
    pairs = clique_edges(0, 8)
    info, closed = approx_triangles(
        _edges_ds(pairs), _offsets(8), str(tmp_path / "cl"),
        DEFAULT, k_samples=500)
    assert info["kappa"] == 1.0
    tri, wedges = exact_counts(8, pairs)
    assert info["triangles_est"] == pytest.approx(tri)
    assert closed.count() == 500


def test_triangle_free_zero(tmp_path):
    # star: plenty of wedges, no closures
    pairs = [(0, i) for i in range(1, 12)]
    info, closed = approx_triangles(
        _edges_ds(pairs), _offsets(12), str(tmp_path / "star"),
        DEFAULT, k_samples=300)
    assert info["kappa"] == 0.0
    assert info["triangles_est"] == 0.0
    assert closed.count() == 0


def test_no_wedges(tmp_path):
    # a single edge has zero wedges
    info, _ = approx_triangles(
        _edges_ds([(0, 1)]), _offsets(2), str(tmp_path / "e"),
        DEFAULT, k_samples=100)
    assert info["n_wedges"] == 0.0
    assert info["triangles_est"] == 0.0


def test_fixed_layout_bitwise_rerun(tmp_path):
    n = 60
    pairs = random_pairs(n, 0.1, 3)
    a, ca = approx_triangles(
        _edges_ds(pairs), _offsets(n, 4), str(tmp_path / "r1"),
        DEFAULT, k_samples=2000, seed=9)
    b, cb = approx_triangles(
        _edges_ds(pairs), _offsets(n, 4), str(tmp_path / "r2"),
        DEFAULT, k_samples=2000, seed=9)
    assert a["kappa"] == b["kappa"]
    pa_ = ca.to_pandas().sort_values("slot").reset_index(drop=True)
    pb_ = cb.to_pandas().sort_values("slot").reset_index(drop=True)
    assert pa_.equals(pb_)
    # a different seed draws different wedges
    c, _ = approx_triangles(
        _edges_ds(pairs), _offsets(n, 4), str(tmp_path / "r3"),
        DEFAULT, k_samples=2000, seed=10)
    assert c["n_closed"] != a["n_closed"] or c["kappa"] == a["kappa"]


def test_validation(tmp_path):
    with pytest.raises(ValueError):
        approx_triangles(_edges_ds([(0, 1)]), _offsets(2),
                         str(tmp_path / "v"), DEFAULT, k_samples=0)

"""Spectral embedding: dense-eigh Ritz-value parity, subspace
alignment, layout invariance, isolated vertices, planted-block
recovery of the composed clustering."""

import numpy as np
import pytest

from halvesting_geometric_ray.config import DEFAULT
from halvesting_geometric_ray.graph.spectral import (
    spectral_clustering, spectral_embedding)

from tests.test_louvain import _edges_ds, _offsets, clique_edges


def dense_m(n, pairs):
    """The half-shifted operator M = (I + D^{-1/2} A D^{-1/2}) / 2
    with zero coupling rows for isolated vertices."""
    a = np.zeros((n, n))
    for u, v in pairs:
        a[u, v] = a[v, u] = 1.0
    deg = a.sum(axis=1)
    with np.errstate(divide="ignore"):
        di = 1.0 / np.sqrt(deg)
    di[deg == 0] = 0.0
    s = di[:, None] * a * di[None, :]
    return 0.5 * (np.eye(n) + s)


def emb_matrix(ds, n, k):
    pdf = ds.to_pandas().sort_values("vid")
    return np.vstack([np.asarray(e, dtype=np.float64)
                      for e in pdf["embedding"]]).reshape(n, k)


def random_pairs(n, p, seed):
    rng = np.random.default_rng(seed)
    m = rng.random((n, n)) < p
    iu = np.triu_indices(n, 1)
    return [(a, b) for a, b in zip(*iu) if m[a, b]]


@pytest.mark.parametrize("seed", [0, 4])
def test_ritz_values_match_dense_eigh(tmp_path, seed):
    n, k = 50, 4
    pairs = random_pairs(n, 0.15, seed)
    ds, info = spectral_embedding(
        _edges_ds(pairs), _offsets(n), str(tmp_path / f"s{seed}"),
        DEFAULT, k=k, tol=1e-12, max_iters=600, seed=7)
    w = np.linalg.eigvalsh(dense_m(n, pairs))[::-1]
    got = 0.5 * (np.asarray(info["eigenvalues"]) + 1.0)  # back to M
    assert np.allclose(got, w[:k], atol=1e-7), (got, w[:k])
    # principal eigenvalue of S is 1 on any graph with edges
    assert abs(info["eigenvalues"][0] - 1.0) < 1e-9


def test_subspace_alignment_and_orthonormality(tmp_path):
    n, k = 40, 3
    pairs = random_pairs(n, 0.2, 1)
    ds, info = spectral_embedding(
        _edges_ds(pairs), _offsets(n), str(tmp_path / "al"),
        DEFAULT, k=k, tol=1e-12, max_iters=600, seed=3)
    x = emb_matrix(ds, n, k)
    # orthonormal columns
    assert np.allclose(x.T @ x, np.eye(k), atol=1e-9)
    # spans the dense top-k eigenspace: all principal-angle cosines ~ 1
    w, v = np.linalg.eigh(dense_m(n, pairs))
    vtop = v[:, ::-1][:, :k]
    sv = np.linalg.svd(vtop.T @ x, compute_uv=False)
    assert sv.min() > 1.0 - 1e-6
    # each column is a Ritz vector: M x_j ~ theta_j x_j
    m = dense_m(n, pairs)
    theta = 0.5 * (np.asarray(info["eigenvalues"]) + 1.0)
    for j in range(k):
        assert np.linalg.norm(m @ x[:, j] - theta[j] * x[:, j]) < 1e-5


@pytest.mark.parametrize("parts,actors", [(1, 0), (4, 3)])
def test_layout_invariance(tmp_path, parts, actors):
    n, k = 45, 3
    pairs = random_pairs(n, 0.18, 9)
    ds, info = spectral_embedding(
        _edges_ds(pairs), _offsets(n, parts),
        str(tmp_path / f"p{parts}"), DEFAULT, k=k, tol=1e-12,
        max_iters=600, seed=11, num_actors=actors)
    x = emb_matrix(ds, n, k)
    # single-layout reference
    ds1, _ = spectral_embedding(
        _edges_ds(pairs), _offsets(n, 1),
        str(tmp_path / "ref"), DEFAULT, k=k, tol=1e-12,
        max_iters=600, seed=11)
    x1 = emb_matrix(ds1, n, k)
    # across layouts: same vectors to float-association tolerance
    # (column signs fixed by the deterministic init + positive-diag QR)
    assert np.allclose(x, x1, atol=1e-6)


def test_isolated_vertices_zero_rows(tmp_path):
    # a triangle + two isolates: isolates have zero coupling and fall
    # out of the dominant subspace
    pairs = [(0, 1), (1, 2), (0, 2)]
    n, k = 5, 2
    ds, info = spectral_embedding(
        _edges_ds(pairs), _offsets(n), str(tmp_path / "iso"),
        DEFAULT, k=k, tol=1e-12, max_iters=400, seed=5)
    x = emb_matrix(ds, n, k)
    # top-2 eigenvalues of the triangle under M are 1 and 1/4
    assert np.allclose(info["eigenvalues"][:1], [1.0], atol=1e-9)
    # isolates: M acts as I/2 there, eigenvalue 1/2 sits between the
    # triangle's 1 and 1/4 — second Ritz pair is an isolate direction
    assert abs(0.5 * (info["eigenvalues"][1] + 1.0) - 0.5) < 1e-9
    # vector accuracy at the value-stabilization stop is gap-limited
    # (contamination ~ sqrt(dtheta)/gap): 1e-5 here, not 1e-7
    assert np.allclose(np.abs(x[:3, 0]), 1.0 / np.sqrt(3), atol=1e-5)
    assert np.allclose(x[3:, 0], 0.0, atol=1e-5)


def test_spectral_clustering_recovers_planted_blocks(tmp_path):
    # two dense blocks + one sparse bridge edge
    pairs = clique_edges(0, 10) + clique_edges(10, 20) + [(9, 10)]
    n = 20
    labels, info = spectral_clustering(
        _edges_ds(pairs), _offsets(n), str(tmp_path / "sc"),
        DEFAULT, n_clusters=2, dim=2, seed=5)
    pdf = labels.to_pandas().sort_values("vid")
    c = pdf["cluster"].to_numpy()
    assert len(set(c[:10])) == 1 and len(set(c[10:])) == 1
    assert c[0] != c[10]


def test_k_validation(tmp_path):
    with pytest.raises(ValueError):
        spectral_embedding(_edges_ds([(0, 1)]), _offsets(2),
                           str(tmp_path / "v"), DEFAULT, k=0)
    with pytest.raises(ValueError):
        spectral_embedding(_edges_ds([(0, 1)]), _offsets(2),
                           str(tmp_path / "v2"), DEFAULT, k=5)

"""SALSA closed form vs an independent power-iteration oracle.

The oracle iterates the authority chain P_a = W_c^T @ W_r (step
backward along an in-link with prob 1/indeg, then forward along an
out-link with prob 1/outdeg) from the uniform distribution over
authorities — for a reducible chain that start assigns each bipartite
component exactly its |A ∩ C| / |A| share, which is the Lempel-Moran
reducibility treatment the closed form implements, so the two must
agree to iteration tolerance.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.config import DEFAULT
from halvesting_geometric_ray.graph.salsa import salsa


def _rand_edges(rng, n, m, blocks=2):
    """Random simple directed edges over `blocks` disjoint vid ranges
    (guarantees a reducible support graph)."""
    per = n // blocks
    rows = []
    for b in range(blocks):
        lo = b * per
        hi = lo + per
        cnt = 0
        while cnt < m // blocks:
            s = int(rng.integers(lo, hi))
            d = int(rng.integers(lo, hi))
            if s != d:
                rows.append((s, d))
                cnt += 1
    e = sorted(set(rows))
    return np.array([r[0] for r in e]), np.array([r[1] for r in e])


def _oracle(n, src, dst, iters=3000):
    M = np.zeros((n, n))
    M[src, dst] = 1.0
    outdeg = M.sum(axis=1)
    indeg = M.sum(axis=0)
    Wr = np.divide(M, outdeg[:, None], out=np.zeros_like(M),
                   where=outdeg[:, None] > 0)
    Wc = np.divide(M, indeg[None, :], out=np.zeros_like(M),
                   where=indeg[None, :] > 0)
    Pa = Wc.T @ Wr          # authority chain
    Ph = Wr @ Wc.T          # hub chain
    a = (indeg > 0).astype(float)
    a /= a.sum()
    h = (outdeg > 0).astype(float)
    h /= h.sum()
    for _ in range(iters):
        a = a @ Pa
        h = h @ Ph
    return a, h


def _run(src, dst, n, num_parts=4, tmpdir="/tmp/hgr_salsa_t"):
    import shutil
    shutil.rmtree(tmpdir, ignore_errors=True)
    edges = rd.from_arrow(pa.table({"src": pa.array(src, type=pa.int64()),
                                    "dst": pa.array(dst, type=pa.int64())}))
    offsets = np.linspace(0, n, num_parts + 1).astype(np.int64)
    offsets[-1] = n
    out, info = salsa(edges, offsets, tmpdir)
    df = out.to_pandas().set_index("vid").sort_index()
    a = np.zeros(n)
    h = np.zeros(n)
    a[df.index.to_numpy()] = df["authority"].to_numpy()
    h[df.index.to_numpy()] = df["hub"].to_numpy()
    return a, h


def test_salsa_matches_power_iteration(ray_session):
    rng = np.random.default_rng(5)
    n = 60
    src, dst = _rand_edges(rng, n, 240, blocks=3)
    a, h = _run(src, dst, n)
    ao, ho = _oracle(n, src, dst)
    np.testing.assert_allclose(a, ao, atol=1e-8)
    np.testing.assert_allclose(h, ho, atol=1e-8)
    assert abs(a.sum() - 1.0) < 1e-9
    assert abs(h.sum() - 1.0) < 1e-9


def test_salsa_layout_invariant(ray_session):
    rng = np.random.default_rng(9)
    n = 40
    src, dst = _rand_edges(rng, n, 150, blocks=2)
    a1, h1 = _run(src, dst, n, num_parts=2, tmpdir="/tmp/hgr_salsa_l2")
    a2, h2 = _run(src, dst, n, num_parts=7, tmpdir="/tmp/hgr_salsa_l7")
    # closed form = exact integer ratios -> bitwise equal across layouts
    assert (a1 == a2).all()
    assert (h1 == h2).all()


def test_salsa_ignores_self_loops_and_dups(ray_session):
    rng = np.random.default_rng(11)
    n = 30
    src, dst = _rand_edges(rng, n, 100, blocks=1)
    a1, h1 = _run(src, dst, n, tmpdir="/tmp/hgr_salsa_c")
    src2 = np.concatenate([src, src[:5], np.arange(5)])
    dst2 = np.concatenate([dst, dst[:5], np.arange(5)])
    a2, h2 = _run(src2, dst2, n, tmpdir="/tmp/hgr_salsa_d")
    assert (a1 == a2).all()
    assert (h1 == h2).all()


def test_salsa_star_closed_form(ray_session):
    """Star s -> {1..k}: one component; authority uniform over leaves,
    hub 1 on the center."""
    k = 7
    src = np.zeros(k, dtype=np.int64)
    dst = np.arange(1, k + 1, dtype=np.int64)
    a, h = _run(src, dst, k + 1, tmpdir="/tmp/hgr_salsa_s")
    np.testing.assert_allclose(a[1:], np.full(k, 1.0 / k))
    assert a[0] == 0.0
    assert h[0] == 1.0
    assert (h[1:] == 0.0).all()

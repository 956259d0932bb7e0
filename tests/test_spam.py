"""TrustRank spam mass: link-farm detection + NumPy composition oracle."""

import numpy as np
import pandas as pd
import ray.data as rd

from halvesting_geometric_ray.graph.spam import spam_mass


def pagerank_np(n, src, dst, d=0.85, tol=1e-6, seeds=None, iters=500):
    A_out = np.bincount(src, minlength=n)
    r0 = np.full(n, 1.0 / n)
    if seeds is not None:
        r0 = np.zeros(n)
        r0[seeds] = 1.0 / len(seeds)
    r = r0.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / A_out[src])
        dm = r[A_out == 0].sum()
        new = (1 - d) * r0 + d * (contrib + dm * r0)
        if np.abs(new - r).sum() < tol:
            return new
        r = new
    return r


def _farm_graph():
    """Good core 0-4 (ring + cross links), spam target 5 boosted by a
    farm 6..25 that only links to 5 (and is linked from nowhere good)."""
    src, dst = [], []
    for i in range(5):
        src += [i, i]
        dst += [(i + 1) % 5, (i + 2) % 5]
    for f in range(6, 26):
        src.append(f)
        dst.append(5)
    src.append(5)
    dst.append(6)  # farm-internal backlink
    return (np.array(src, dtype=np.int64), np.array(dst, dtype=np.int64),
            26)


def test_link_farm_detection(tmp_path):
    src, dst, n = _farm_graph()
    edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    offsets = np.array([0, n], dtype=np.int64)
    seeds = np.array([0, 1, 2, 3, 4], dtype=np.int64)
    ds, info = spam_mass(edges, offsets, str(tmp_path / "sm"), seeds)
    df = ds.to_pandas().set_index("vid").sort_index()
    # the boosted spam target has high rank but ~no trust
    assert df.spam_mass.loc[5] > 0.9
    # good-core pages: trust-backed, low spam mass
    assert (df.spam_mass.loc[[0, 1, 2, 3, 4]] < 0.35).all()
    # composition oracle: both vectors match NumPy PageRank
    pr = pagerank_np(n, src, dst)
    tr = pagerank_np(n, src, dst, seeds=seeds)
    assert np.allclose(df.pr.to_numpy(), pr, atol=1e-6)
    assert np.allclose(df.trust.to_numpy(), tr, atol=1e-6)
    assert np.allclose(df.spam_mass.to_numpy(), (pr - tr) / pr, atol=1e-5)
    assert info["seeds"] == [0, 1, 2, 3, 4]


def test_partitioned(tmp_path):
    src, dst, n = _farm_graph()
    edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    seeds = np.array([0, 1, 2, 3, 4], dtype=np.int64)
    one = spam_mass(edges, np.array([0, n], dtype=np.int64),
                    str(tmp_path / "p1"), seeds)[0].to_pandas()
    four = spam_mass(edges, np.array([0, 7, 13, 20, n], dtype=np.int64),
                     str(tmp_path / "p4"), seeds)[0].to_pandas()
    a = one.sort_values("vid").reset_index(drop=True)
    b = four.sort_values("vid").reset_index(drop=True)
    assert np.allclose(a.spam_mass, b.spam_mass, atol=1e-9)

"""Warm-started connected components for the incremental-recrawl path:
labels from a previous run on a subgraph are a valid starting point
(edges only merge components), converge to BITWISE the same labels as
a cold run, and need fewer rounds on structured merges."""

import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.components import connected_components


def _sym(src, dst):
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    return rd.from_arrow(pa.table({"src": pa.array(s, type=pa.int64()),
                                   "dst": pa.array(d, type=pa.int64())}))


def _off(n, parts):
    off = np.linspace(0, n, parts + 1).astype(np.int64)
    off[-1] = n
    return off


def _labels_np(ds, n):
    df = ds.to_pandas()
    lab = np.full(n, -1, dtype=np.int64)
    lab[df["vid"].to_numpy()] = df["label"].to_numpy()
    return lab


def test_warm_equals_cold_random(ray_session):
    rng = np.random.default_rng(31)
    n = 200
    src1 = rng.integers(0, n, 150).astype(np.int64)
    dst1 = rng.integers(0, n, 150).astype(np.int64)
    delta_s = rng.integers(0, n, 40).astype(np.int64)
    delta_d = rng.integers(0, n, 40).astype(np.int64)
    off = _off(n, 4)
    for d in ("/tmp/hgr_ccw_v1", "/tmp/hgr_ccw_cold", "/tmp/hgr_ccw_warm"):
        shutil.rmtree(d, ignore_errors=True)
    lab1, _ = connected_components(_sym(src1, dst1), off,
                                   "/tmp/hgr_ccw_v1", resume=False)
    full = _sym(np.concatenate([src1, delta_s]),
                np.concatenate([dst1, delta_d]))
    cold, ic = connected_components(full, off, "/tmp/hgr_ccw_cold",
                                    resume=False)
    warm, iw = connected_components(full, off, "/tmp/hgr_ccw_warm",
                                    resume=False, warm_labels=lab1)
    assert (_labels_np(cold, n) == _labels_np(warm, n)).all()
    assert iw["num_iters"] <= ic["num_iters"]


def test_warm_fewer_rounds_on_chain_merge(ray_session):
    k = 600
    # v1: two disjoint paths 0..k-1 and k..2k-1
    a = np.arange(k - 1, dtype=np.int64)
    src1 = np.concatenate([a, a + k])
    dst1 = np.concatenate([a + 1, a + k + 1])
    n = 2 * k
    off = _off(n, 4)
    for d in ("/tmp/hgr_ccc_v1", "/tmp/hgr_ccc_cold", "/tmp/hgr_ccc_warm"):
        shutil.rmtree(d, ignore_errors=True)
    lab1, i1 = connected_components(_sym(src1, dst1), off,
                                    "/tmp/hgr_ccc_v1", resume=False)
    # delta: one edge joins the two chains
    src2 = np.concatenate([src1, [k - 1]])
    dst2 = np.concatenate([dst1, [k]])
    cold, ic = connected_components(_sym(src2, dst2), off,
                                    "/tmp/hgr_ccc_cold", resume=False)
    warm, iw = connected_components(_sym(src2, dst2), off,
                                    "/tmp/hgr_ccc_warm", resume=False,
                                    warm_labels=lab1)
    lc, lw = _labels_np(cold, n), _labels_np(warm, n)
    assert (lc == lw).all()
    assert (lw == 0).all()          # one merged component rooted at 0
    # warm start resolves the merge in ~2 rounds; cold pays the full
    # pointer-jumping ladder for the 600-vertex chains
    assert iw["num_iters"] < ic["num_iters"]
    assert iw["num_iters"] <= 4


def test_warm_with_new_vertices(ray_session):
    # v1 graph over vids 0..9; v2 extends the vid space to 16 with new
    # vertices wired into component 0
    src1 = np.array([0, 1, 2, 5, 6], dtype=np.int64)
    dst1 = np.array([1, 2, 3, 6, 7], dtype=np.int64)
    for d in ("/tmp/hgr_ccn_v1", "/tmp/hgr_ccn_warm", "/tmp/hgr_ccn_cold"):
        shutil.rmtree(d, ignore_errors=True)
    lab1, _ = connected_components(_sym(src1, dst1), _off(10, 2),
                                   "/tmp/hgr_ccn_v1", resume=False)
    src2 = np.concatenate([src1, [3, 12, 14]])
    dst2 = np.concatenate([dst1, [12, 14, 15]])
    off2 = _off(16, 3)
    cold, _ = connected_components(_sym(src2, dst2), off2,
                                   "/tmp/hgr_ccn_cold", resume=False)
    warm, _ = connected_components(_sym(src2, dst2), off2,
                                   "/tmp/hgr_ccn_warm", resume=False,
                                   warm_labels=lab1)
    assert (_labels_np(cold, 16) == _labels_np(warm, 16)).all()

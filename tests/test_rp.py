"""Johnson-Lindenstrauss random projection: matrix construction,
sequential-matmul parity of the distributed pass, and the JL
distance-preservation guarantee on fixed seeds.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.whiten import (random_projection,
                                                       rp_matrix)


def _emb_table(n, d, seed):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(X.ravel(), type=pa.float64()), d),
    }), X


# ------------------------------------------------------------- matrix

def test_rp_matrix_deterministic_and_shapes():
    A = rp_matrix(64, 16, seed=3)
    B = rp_matrix(64, 16, seed=3)
    np.testing.assert_array_equal(A, B)
    assert A.shape == (16, 64)
    assert not np.array_equal(A, rp_matrix(64, 16, seed=4))


def test_sparse_matrix_achlioptas_distribution():
    R = rp_matrix(256, 64, seed=0, kind="sparse")
    vals = np.unique(np.abs(R))
    s = np.sqrt(3.0 / 64)
    np.testing.assert_allclose(vals[vals > 0], [s], rtol=1e-12)
    nnz = (R != 0).mean()
    assert 0.28 < nnz < 0.39  # expect 1/3
    # sign symmetry
    assert abs((R > 0).sum() - (R < 0).sum()) < 0.15 * (R != 0).sum()


def test_gauss_matrix_scale():
    R = rp_matrix(512, 128, seed=1, kind="gauss")
    # column norms concentrate around 1 at this size... row var = 1/d_out
    assert abs(R.var() * 128 - 1.0) < 0.1


def test_bad_args_raise():
    with pytest.raises(ValueError):
        rp_matrix(8, 0)
    with pytest.raises(ValueError):
        rp_matrix(8, 4, kind="nope")
    t, _ = _emb_table(4, 8, 0)
    with pytest.raises(ValueError):
        random_projection(rd.from_arrow(t), 16)  # d_out > d_in


# -------------------------------------------------------------- parity

def test_distributed_matches_sequential_matmul():
    t, X = _emb_table(120, 32, seed=5)
    R = rp_matrix(32, 8, seed=9)
    for nblocks in (1, 7):
        ds = rd.from_arrow(t).repartition(nblocks)
        out, info = random_projection(ds, 8, seed=9)
        df = out.to_pandas().sort_values("vec_id")
        Y = np.stack([np.asarray(v) for v in df["embedding"]])
        np.testing.assert_allclose(Y, X @ R.T, rtol=1e-12, atol=1e-12)
    assert info["d_in"] == 32 and info["d_out"] == 8
    assert 0 < info["nnz_frac"] < 1


# ---------------------------------------------------- JL preservation

def test_distance_ratios_concentrate():
    t, X = _emb_table(300, 128, seed=2)
    out, _ = random_projection(rd.from_arrow(t), 48, seed=11)
    df = out.to_pandas().sort_values("vec_id")
    Y = np.stack([np.asarray(v) for v in df["embedding"]])
    i = np.arange(150)
    j = i + 150
    r = (np.linalg.norm(Y[i] - Y[j], axis=1)
         / np.linalg.norm(X[i] - X[j], axis=1))
    # JL at k=48: eps ~ sqrt(8 ln n / k) — generous fixed-seed bounds
    assert r.min() > 0.55 and r.max() < 1.6
    assert abs(r.mean() - 1.0) < 0.08


def test_query_rp_distortion():
    from halvesting_geometric_ray.queries_text import QUERIES

    df = QUERIES["q_rp_distortion"]("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 100
    assert df.dist_ratio.between(0.5, 1.6).all()
    assert abs(df.dist_ratio.mean() - 1.0) < 0.1

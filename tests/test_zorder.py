"""Z-order clustered layout (ops/zorder.py): interleave correctness,
determinism, and measured pruning win vs an unclustered write."""

import shutil

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.zorder import (_interleave,
                                                 prune_fraction,
                                                 zorder_extents,
                                                 zorder_values,
                                                 zorder_write)


def test_interleave_bit_layout():
    # d=2, bits=2: x=0b01, y=0b10 -> z bits: y1 x1 y0 x0 = 1 0 0 1
    r = np.array([[0b01, 0b10]], dtype=np.int64)
    assert _interleave(r, 2)[0] == 0b1001
    # z is monotone in each coordinate holding the other fixed
    xs = np.arange(4)
    z = _interleave(np.column_stack([xs, np.zeros(4, int)]), 2)
    assert list(z) == sorted(z)
    with pytest.raises(ValueError, match="62"):
        _interleave(np.zeros((1, 4), dtype=np.int64), 16)


def _pdf(n=20_000, seed=2):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "x": rng.gamma(2.0, 10.0, n),        # skewed
        "y": rng.normal(100.0, 20.0, n),
        "payload": rng.integers(0, 1 << 30, n),
    })


def test_zorder_values_deterministic_and_balanced():
    pdf = _pdf()
    # same input layout -> bitwise-identical z (rerun determinism);
    # a different layout only shifts KLL bin edges (placement, not
    # content) — documented in the module docstring
    z1, info = zorder_values(rd.from_pandas(pdf).repartition(4),
                             ["x", "y"], bits=6)
    z2, _ = zorder_values(rd.from_pandas(pdf).repartition(4),
                          ["x", "y"], bits=6)
    a = z1.to_pandas().sort_values("payload").reset_index(drop=True)
    b = z2.to_pandas().sort_values("payload").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert info["bits"] == 6 and len(info["edges"]["x"]) == 63
    # layout change preserves the data multiset
    z3, _ = zorder_values(rd.from_pandas(pdf).repartition(9),
                          ["x", "y"], bits=6)
    c = z3.to_pandas().sort_values("payload").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["x", "y", "payload"]],
                                  c[["x", "y", "payload"]],
                                  check_exact=True)


def test_zorder_write_prunes_box_queries(tmp_path):
    pdf = _pdf()
    clustered = str(tmp_path / "clustered")
    plain = str(tmp_path / "plain")
    shutil.rmtree(clustered, ignore_errors=True)
    zorder_write(rd.from_pandas(pdf).repartition(8), ["x", "y"],
                 clustered, bits=6, num_files=32)
    # unclustered baseline: random layout, same file count
    base = rd.from_pandas(pdf).repartition(8).map_batches(
        lambda b: b.assign(zfile=np.random.default_rng(0).integers(
            0, 32, len(b))), batch_format="pandas")
    base.write_parquet(plain, partition_cols=["zfile"])

    ec = zorder_extents(clustered, ["x", "y"])
    ep = zorder_extents(plain, ["x", "y"])
    # a small box around the medians
    box = {"x": (np.quantile(pdf.x, 0.45), np.quantile(pdf.x, 0.55)),
           "y": (np.quantile(pdf.y, 0.45), np.quantile(pdf.y, 0.55))}
    fc = prune_fraction(ec, ["x", "y"], box)
    fp = prune_fraction(ep, ["x", "y"], box)
    assert fp > 0.9          # random layout: nearly every file hit
    assert fc < 0.5 * fp     # clustered: most files pruned
    # correctness: clustered layout holds exactly the input multiset
    back = rd.read_parquet(clustered).to_pandas()
    assert sorted(back.payload) == sorted(pdf.payload)


def test_zorder_validation():
    pdf = _pdf(100)
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_values(rd.from_pandas(pdf), ["x"])
    with pytest.raises(ValueError, match="power of two"):
        zorder_write(rd.from_pandas(pdf), ["x", "y"], "/tmp/zz",
                     num_files=3)

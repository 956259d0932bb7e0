"""Weighted waterfill/LDG semantics + the multilevel V-cycle:
fine-level balance, coverage, determinism, and cut sanity vs flat LDG
on a planted-partition graph."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.multilevel import multilevel_partition
from halvesting_geometric_ray.graph.partition import (ldg_partition,
                                                      partition_cut,
                                                      refine_partition,
                                                      waterfill_assign)


def test_waterfill_unit_weights_bitwise_backcompat():
    rng = np.random.default_rng(0)
    m, k = 37, 4
    scores = rng.random((m, k))
    vids = rng.permutation(m).astype(np.int64)
    frozen = np.array([3, 0, 5, 1], dtype=np.int64)
    a = waterfill_assign(scores, vids, frozen, cap=12)
    b = waterfill_assign(scores, vids, frozen, cap=12,
                         weights=np.ones(m, dtype=np.int64))
    assert (a == b).all()


def test_waterfill_weighted_prefix_rule():
    # one block is everyone's best; remaining weight 3, weights 2,2,1
    # by priority -> keep the first (cw 2), spill at the weight-2 that
    # overflows (cw 4 > 3), prefix rule spills the trailing 1 too
    scores = np.array([[1.0, 0.0], [0.9, 0.0], [0.8, 0.0]])
    vids = np.array([10, 11, 12], dtype=np.int64)
    frozen = np.array([0, 0], dtype=np.int64)
    w = np.array([2, 2, 1], dtype=np.int64)
    got = waterfill_assign(scores, vids, frozen, cap=3, weights=w)
    assert got[0] == 0          # fits (cum weight 2 <= 3)
    assert got[1] == 1          # spills to second choice
    assert got[2] == 1          # prefix rule: behind the spiller


def test_waterfill_weighted_soft_overflow():
    # k=1, cap 1, single vertex of weight 2: must place (overflow 1)
    scores = np.array([[0.5]])
    got = waterfill_assign(scores, np.array([0], dtype=np.int64),
                           np.array([0], dtype=np.int64), cap=1,
                           weights=np.array([2], dtype=np.int64))
    assert got[0] == 0


def _planted(n=200, seed=3, p_in=0.12, p_out=0.01):
    """Two planted clusters: dense inside, sparse across."""
    rng = np.random.default_rng(seed)
    half = n // 2
    m = rng.random((n, n))
    same = np.zeros((n, n), dtype=bool)
    same[:half, :half] = True
    same[half:, half:] = True
    adj = np.triu((m < np.where(same, p_in, p_out)), 1)
    src, dst = np.nonzero(adj)
    s = np.concatenate([src, dst]).astype(np.int64)
    d = np.concatenate([dst, src]).astype(np.int64)
    return n, rd.from_pandas(pd.DataFrame({"src": s, "dst": d})), s, d


def test_weighted_ldg_balance_in_weight_units(tmp_path):
    n, edges, _, _ = _planted(120, seed=1)
    off = np.array([0, n], dtype=np.int64)
    rng = np.random.default_rng(5)
    w = rng.integers(1, 3, n).astype(np.int64)  # weights 1..2
    vw = rd.from_pandas(pd.DataFrame({"vid": np.arange(n), "w": w}))
    blocks, info = ldg_partition(edges, off, str(tmp_path / "wldg"),
                                 k=3, eps=0.1, vertex_weights=vw)
    assert info["W"] == int(w.sum())
    got = blocks.to_pandas().sort_values("vid")
    wsizes = np.bincount(got.block.to_numpy(), weights=w, minlength=3)
    assert (wsizes == np.array(info["sizes"])).all()
    assert (wsizes <= info["cap"] + info["overflow"]).all()


def test_multilevel_covers_balances_and_is_layout_independent(tmp_path):
    n, edges, s, d = _planted(200, seed=3)
    off = np.array([0, n // 2, n], dtype=np.int64)
    outs = []
    for na in (1, 2):
        blocks, info = multilevel_partition(
            edges, off, str(tmp_path / f"ml{na}"), k=2, eps=0.1,
            levels=2, num_actors=na)
        got = blocks.to_pandas().sort_values("vid").reset_index(drop=True)
        # exactly one row per fine vertex
        assert (got.vid.to_numpy() == np.arange(n)).all()
        sizes = np.bincount(got.block.to_numpy(), minlength=2)
        assert (sizes <= info["cap"] + info["ldg"]["overflow"]).all()
        assert len(info["levels"]) == 2
        assert info["levels"][1]["n_fine"] == info["levels"][0]["n_coarse"]
        outs.append(got.block.to_numpy())
    assert (outs[0] == outs[1]).all()  # actor layout independent


def test_refine_improves_a_scrambled_planted_assignment(tmp_path):
    # planted two-cluster graph with a deliberately bad warm start:
    # blocks assigned by vid parity (near-worst cut).  Refinement must
    # cut it down sharply, keep every vertex, respect the cap, and be
    # actor-layout independent.
    n, edges, _, _ = _planted(200, seed=11, p_in=0.12, p_out=0.004)
    off = np.array([0, n], dtype=np.int64)
    warm = rd.from_pandas(pd.DataFrame({
        "vid": np.arange(n, dtype=np.int64),
        "block": (np.arange(n) % 2).astype(np.int32)}))
    cut0 = partition_cut(edges, warm)["cut_fraction"]
    outs = []
    for na in (1, 2):
        # chunk < n so outflow capacity credit flows within a sweep
        # (the at-scale regime: many chunks per part)
        ref, info = refine_partition(edges, off, warm,
                                     str(tmp_path / f"r{na}"), k=2,
                                     eps=0.1, chunk=50, sweeps=12,
                                     num_actors=na)
        got = ref.to_pandas().sort_values("vid").reset_index(drop=True)
        assert (got.vid.to_numpy() == np.arange(n)).all()
        sizes = np.bincount(got.block.to_numpy(), minlength=2)
        assert (sizes <= info["cap"]).all()
        assert (sizes == np.array(info["sizes"])).all()
        assert info["n_moves"] > 0
        outs.append(got.block.to_numpy())
        cut1 = partition_cut(edges, ref.materialize())["cut_fraction"]
        assert cut1 < 0.1  # parity start is ~0.48; planted ~0.03
    assert (outs[0] == outs[1]).all()


def test_multilevel_cut_not_worse_than_flat_on_planted(tmp_path):
    n, edges, _, _ = _planted(300, seed=7, p_in=0.10, p_out=0.005)
    off = np.array([0, n], dtype=np.int64)
    flat, _ = ldg_partition(edges, off, str(tmp_path / "flat"), k=2,
                            eps=0.1)
    ml, _ = multilevel_partition(edges, off, str(tmp_path / "ml"), k=2,
                                 eps=0.1, levels=2)
    cut_flat = partition_cut(edges, flat.materialize())["cut_fraction"]
    cut_ml = partition_cut(edges, ml.materialize())["cut_fraction"]
    # planted two-cluster structure: coarsening must not hurt, and
    # should recover (near-)the planted cut
    assert cut_ml <= cut_flat + 1e-9

"""Exact 4-clique counting (graph/cliques.py) vs brute-force oracle:
planted K5, random graphs, directed-input canonicalization, and
partitioning invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from halvesting_geometric_ray.config import EngineConfig
from halvesting_geometric_ray.graph.cliques import (cliques4_canonical,
                                                    cliques4_edges)

from .oracle import cliques4_oracle


def _full(per_df, n, col="cliques4"):
    full = np.zeros(n, dtype=np.int64)
    if len(per_df):
        full[per_df.vid.to_numpy()] = per_df[col].to_numpy()
    return full


def _edges_ds(src, dst):
    return rd.from_pandas(pd.DataFrame({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64)}))


def test_k5_planted():
    # K5 on 0..4 plus a pendant edge; C(5,4)=5 cliques, each vertex in 4
    src, dst = [], []
    for i in range(5):
        for j in range(i + 1, 5):
            src.append(i)
            dst.append(j)
    src.append(4)
    dst.append(5)
    per, total = cliques4_edges(_edges_ds(src, dst),
                                EngineConfig(num_parts=4))
    assert total == 5
    full = _full(per.to_pandas(), 6)
    assert full.tolist() == [4, 4, 4, 4, 4, 0]


def test_random_graph_matches_oracle_and_directed_input():
    rng = np.random.default_rng(5)
    n, m = 40, 260
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)  # includes self-loops + dups + both dirs
    exp_per, exp_total = cliques4_oracle(n, src, dst)
    assert exp_total > 0  # fixture must actually contain 4-cliques
    per, total = cliques4_edges(_edges_ds(src, dst),
                                EngineConfig(num_parts=8))
    assert total == exp_total
    assert (_full(per.to_pandas(), n) == exp_per).all()


def test_partitioning_invariance():
    rng = np.random.default_rng(9)
    n, m = 30, 160
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    outs = []
    for parts in (3, 16):
        per, total = cliques4_edges(_edges_ds(src, dst),
                                    EngineConfig(num_parts=parts))
        outs.append((total,
                     per.to_pandas().sort_values("vid")
                     .reset_index(drop=True)))
    assert outs[0][0] == outs[1][0]
    pd.testing.assert_frame_equal(outs[0][1], outs[1][1])


def test_canonical_entrypoint_triangle_free():
    # C4 cycle: triangles exist in none; 4-clique needs all 6 edges
    und = rd.from_pandas(pd.DataFrame({
        "src": np.array([0, 1, 2, 0], dtype=np.int64),
        "dst": np.array([1, 2, 3, 3], dtype=np.int64)}))
    per, total = cliques4_canonical(und, EngineConfig(num_parts=2))
    assert total == 0 and len(per.to_pandas()) == 0

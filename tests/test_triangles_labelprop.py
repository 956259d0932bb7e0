"""Exact triangle counts + deterministic community LP vs oracles."""

import numpy as np
import ray.data as rd

from halvesting_geometric_ray.graph.build import symmetrize
from halvesting_geometric_ray.graph.labelprop import label_propagation
from halvesting_geometric_ray.graph.triangles import triangles, triangles_edges

from .oracle import labelprop_oracle, triangles_oracle


def _sym_simple(g):
    return symmetrize(rd.read_parquet(g.edges), drop_self_loops=True)


def test_triangles_exact_tiny(tiny_graph, tiny_corpus):
    es = rd.read_parquet(tiny_graph.edges).to_pandas()
    n = tiny_graph.num_vertices
    exp_per, exp_total = triangles_oracle(n, es.src.to_numpy(), es.dst.to_numpy())
    per_ds, total = triangles(_sym_simple(tiny_graph))
    assert total == exp_total
    assert exp_total >= 3 * 10  # 3 planted 5-cliques contribute C(5,3)=10 each
    got = per_ds.to_pandas()
    full = np.zeros(n, dtype=np.int64)
    full[got.vid.to_numpy()] = got.triangles.to_numpy()
    assert (full == exp_per).all()


def test_triangles_edges_matches_sym_path(tiny_graph):
    """The directed-input path (canonicalize at E volume, no 2E
    symmetrize) produces identical per-vertex counts and total."""
    per_sym, tot_sym = triangles(_sym_simple(tiny_graph))
    per_e, tot_e = triangles_edges(rd.read_parquet(tiny_graph.edges))
    assert tot_e == tot_sym
    a = per_sym.to_pandas().sort_values("vid").reset_index(drop=True)
    b = per_e.to_pandas().sort_values("vid").reset_index(drop=True)
    assert a.equals(b)


def test_triangles_exact_small(small_graph, tmp_path):
    es = rd.read_parquet(small_graph.edges).to_pandas()
    n = small_graph.num_vertices
    exp_per, exp_total = triangles_oracle(n, es.src.to_numpy(), es.dst.to_numpy())
    per_ds, total = triangles(_sym_simple(small_graph))
    assert total == exp_total
    got = per_ds.to_pandas()
    full = np.zeros(n, dtype=np.int64)
    full[got.vid.to_numpy()] = got.triangles.to_numpy()
    assert (full == exp_per).all()


def test_labelprop_matches_oracle_tiny(tiny_graph, tmp_path):
    es = rd.read_parquet(tiny_graph.edges).to_pandas()
    n = tiny_graph.num_vertices
    exp = labelprop_oracle(n, es.src.to_numpy(), es.dst.to_numpy(), rounds=5)
    labels, info = label_propagation(_sym_simple(tiny_graph), tiny_graph.offsets,
                                     str(tmp_path / "lp"), rounds=5)
    got = labels.to_pandas().sort_values("vid")["label"].to_numpy()
    assert (got == exp).all()
    assert info["num_iters"] == 5

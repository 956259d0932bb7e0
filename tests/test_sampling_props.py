"""Neighbor sampling (R2) + property tests from SURVEY section 5."""

import numpy as np
import ray.data as rd

from halvesting_geometric_ray.graph.build import symmetrize
from halvesting_geometric_ray.graph.csr import build_csr_shards
from halvesting_geometric_ray.graph.sampling import sample_k_hop


def _shards(g, tmp_path):
    descs = build_csr_shards(rd.read_parquet(g.edges), g.offsets,
                             str(tmp_path / "csr"))
    return {d["part"]: d["path"] for d in descs}


def test_sample_k_hop_valid_and_deterministic(tiny_graph, tmp_path):
    paths = _shards(tiny_graph, tmp_path)
    es = rd.read_parquet(tiny_graph.edges).to_pandas()
    edge_set = set(zip(es.src, es.dst))
    seeds = np.array([0, 1, 2, 5], dtype=np.int64)
    nodes, s, d = sample_k_hop(seeds, paths, tiny_graph.offsets, [3, 2])
    assert all((a, b) in edge_set for a, b in zip(s, d))  # real edges only
    # fan-out cap per hop-1 vertex
    import collections

    first_hop = collections.Counter(s[np.isin(s, seeds)])
    assert all(v <= 3 for v in first_hop.values())
    nodes2, s2, d2 = sample_k_hop(seeds, paths, tiny_graph.offsets, [3, 2])
    assert (nodes == nodes2).all() and (s == s2).all() and (d == d2).all()


def test_symmetrize_is_involution_closed(tiny_graph):
    """Property: the symmetrized edge set equals its own transpose."""
    sym = symmetrize(rd.read_parquet(tiny_graph.edges)).to_pandas()
    fwd = set(zip(sym.src, sym.dst))
    assert fwd == {(b, a) for a, b in fwd}


def test_pagerank_mass_conservation(tiny_graph, tmp_path):
    """Property: sum(rank) == 1 at every checkpointed iteration."""
    from halvesting_geometric_ray.graph.pagerank import pagerank

    ranks, info = pagerank(rd.read_parquet(tiny_graph.edges),
                           tiny_graph.offsets, str(tmp_path / "pr"),
                           max_iters=5)
    import pyarrow.parquet as pq
    import glob
    import os

    for it_dir in sorted(glob.glob(os.path.join(str(tmp_path / "pr"),
                                                "pagerank", "iter_*"))):
        total = sum(pq.read_table(f, columns=["rank"]).column("rank")
                    .to_numpy().sum()
                    for f in glob.glob(os.path.join(it_dir, "*.parquet")))
        assert abs(total - 1.0) < 1e-9

"""Connected components: exact labels vs union-find oracle; resume."""

import numpy as np
import ray.data as rd

from halvesting_geometric_ray.graph.build import symmetrize
from halvesting_geometric_ray.graph.components import connected_components

from .oracle import components_oracle


def _sym(g):
    return symmetrize(rd.read_parquet(g.edges))


def _labels(ds):
    return ds.to_pandas().sort_values("vid")["label"].to_numpy()


def test_cc_exact_tiny(tiny_graph, tmp_path):
    es = rd.read_parquet(tiny_graph.edges).to_pandas()
    exp = components_oracle(tiny_graph.num_vertices,
                            es.src.to_numpy(), es.dst.to_numpy())
    labels, info = connected_components(_sym(tiny_graph), tiny_graph.offsets,
                                        str(tmp_path / "cc"))
    assert info["converged"]
    got = _labels(labels)
    assert (got == exp).all()
    # fixture guarantees singleton components (isolated pages)
    uniq, counts = np.unique(exp, return_counts=True)
    assert (counts == 1).any()


def test_cc_exact_small(small_graph, tmp_path):
    es = rd.read_parquet(small_graph.edges).to_pandas()
    exp = components_oracle(small_graph.num_vertices,
                            es.src.to_numpy(), es.dst.to_numpy())
    labels, info = connected_components(_sym(small_graph), small_graph.offsets,
                                        str(tmp_path / "cc"))
    assert info["converged"]
    assert (_labels(labels) == exp).all()


def test_cc_without_pointer_jumping_same_labels(tiny_graph, tmp_path):
    a, _ = connected_components(_sym(tiny_graph), tiny_graph.offsets,
                                str(tmp_path / "pj"), pointer_jumping=True)
    b, info_b = connected_components(_sym(tiny_graph), tiny_graph.offsets,
                                     str(tmp_path / "nopj"), pointer_jumping=False)
    assert (_labels(a) == _labels(b)).all()
    assert info_b["converged"]


def test_cc_resume(tiny_graph, tmp_path):
    wd = str(tmp_path / "cc")
    full, info_full = connected_components(_sym(tiny_graph), tiny_graph.offsets,
                                           str(tmp_path / "full"))
    _, info_a = connected_components(_sym(tiny_graph), tiny_graph.offsets, wd,
                                     max_iters=1)
    assert not info_a["converged"]
    labels, info_b = connected_components(_sym(tiny_graph), tiny_graph.offsets, wd)
    assert info_b["resumed_from"] == 1
    assert (_labels(labels) == _labels(full)).all()

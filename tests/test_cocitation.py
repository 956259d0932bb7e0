"""Co-citation / bibliographic coupling (graph/metrics.py::
cocitation_scores): brute-force oracle, mode duality, hub guard,
validation.  (SQL parity at the gate is swept by
tests/test_queries_graph_oracle.py via q_cocitation_urls /
q_bib_coupling_urls.)"""

from collections import Counter
from itertools import combinations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.metrics import cocitation_scores


def _graph(n=40, p=0.12, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.random((n, n)) < p
    np.fill_diagonal(m, False)
    src, dst = np.nonzero(m)
    ds = rd.from_arrow(pa.table({
        "src": pa.array(src.astype(np.int64)),
        "dst": pa.array(dst.astype(np.int64))}))
    return ds, src, dst, n


def _oracle(src, dst, n, mode, cap=None):
    outs = {}
    c, x = (src, dst) if mode == "cocitation" else (dst, src)
    for u in range(n):
        nb = sorted(x[c == u].tolist())
        if cap is not None and len(nb) > cap:
            continue
        for a, b in combinations(nb, 2):
            outs[(a, b)] = outs.get((a, b), 0) + 1
    return outs


@pytest.mark.parametrize("mode", ["cocitation", "coupling"])
def test_matches_bruteforce(mode):
    ds, src, dst, n = _graph()
    got = {(r.a, r.b): r.score
           for r in cocitation_scores(ds, mode=mode).to_pandas()
           .itertuples()}
    want = _oracle(src, dst, n, mode)
    assert got == want
    assert all(a < b for a, b in got)


def test_modes_are_transposes():
    """coupling on G == cocitation on G with edges reversed."""
    ds, src, dst, n = _graph(seed=9)
    rev = rd.from_arrow(pa.table({
        "src": pa.array(dst.astype(np.int64)),
        "dst": pa.array(src.astype(np.int64))}))
    a = cocitation_scores(ds, mode="coupling").to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    b = cocitation_scores(rev, mode="cocitation").to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert a.equals(b)


def test_hub_guard():
    ds, src, dst, n = _graph(seed=5)
    cap = 4
    got = {(r.a, r.b): r.score
           for r in cocitation_scores(ds, mode="cocitation",
                                      max_center_degree=cap)
           .to_pandas().itertuples()}
    want = _oracle(src, dst, n, "cocitation", cap=cap)
    assert got == want


def test_validation():
    ds, *_ = _graph(seed=7)
    with pytest.raises(ValueError, match="mode"):
        cocitation_scores(ds, mode="jaccard")

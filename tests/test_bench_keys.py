"""Pin that every query key bench.py times still resolves — a renamed
or dropped query must fail CI, not the round-end driver bench."""

import importlib.util
import os


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # import-safe: all work is in run_bench
    return mod


def test_bench_keys_resolve():
    bench = _load_bench()
    from halvesting_geometric_ray import (queries_graph, queries_relational,
                                          queries_text)

    for n in bench.BENCH_KEYS_RELATIONAL:
        assert n in queries_relational.QUERIES, n
    for n in bench.BENCH_KEYS_TEXT:
        assert n in queries_text.QUERIES, n
    for n in bench.BENCH_KEYS_GRAPH:
        assert n in queries_graph.QUERIES, n


def test_bench_keys_registered_in_entry():
    bench = _load_bench()
    import sys
    root = os.path.join(os.path.dirname(__file__), "..")
    if root not in sys.path:
        sys.path.insert(0, root)
    import __ray_entry__ as E

    q = E.queries()
    for n in (bench.BENCH_KEYS_RELATIONAL + bench.BENCH_KEYS_TEXT
              + bench.BENCH_KEYS_GRAPH):
        assert n in q, n


def test_bench_lane_partition():
    """The default lane (stable + new) must be a subset of the full
    key lists, and stable must stay exactly the r3-and-r4-shared set
    so the recorded bench remains comparable round-over-round."""
    bench = _load_bench()
    all_keys = set(bench.BENCH_KEYS_RELATIONAL + bench.BENCH_KEYS_TEXT
                   + bench.BENCH_KEYS_GRAPH)
    assert set(bench.BENCH_KEYS_STABLE) <= all_keys
    assert set(bench.BENCH_KEYS_NEW) <= all_keys
    assert not set(bench.BENCH_KEYS_STABLE) & set(bench.BENCH_KEYS_NEW)


def test_slow_lane_list_resolves():
    """Every _SLOW_TESTS entry must match a collected test (a renamed
    or deleted test would silently shrink the slow lane); modules in
    _SLOW_MODULES must exist."""
    import os

    from tests.conftest import _SLOW_MODULES, _SLOW_TESTS

    root = os.path.join(os.path.dirname(__file__), "..")
    for mod in _SLOW_MODULES:
        assert os.path.exists(os.path.join(root, mod)), mod
    for entry in _SLOW_TESTS:
        path, name = entry.split("::")
        name = name.split("[")[0]
        f = os.path.join(root, path)
        assert os.path.exists(f), entry
        src = open(f).read()
        assert f"def {name}(" in src, entry

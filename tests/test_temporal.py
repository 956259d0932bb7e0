"""earliest_arrival vs a sequential temporal-Dijkstra oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.temporal import earliest_arrival


def _e(rows):
    return rd.from_pandas(pd.DataFrame(
        rows, columns=["src", "dst", "ts"]))


def _seq_oracle(rows, seeds):
    """Label-correcting to fixpoint, sequential."""
    arr = dict(seeds)
    changed = True
    while changed:
        changed = False
        for s, d, ts in rows:
            if s in arr and ts >= arr[s]:
                if d not in arr or ts < arr[d]:
                    arr[d] = ts
                    changed = True
    return arr


def test_blocked_by_time_ordering():
    # seed a at 0; a->b at t=5; b->c at t=3 is BLOCKED (3 < 5);
    # b->d at t=9 works
    rows = [("a", "b", 5), ("b", "c", 3), ("b", "d", 9)]
    out, info = earliest_arrival(_e(rows), [("a", 0)])
    got = dict(zip(out.to_pandas().v, out.to_pandas().arrival))
    assert got == {"a": 0, "b": 5, "d": 9}
    assert info["changed"][-1] == 0


def test_matches_sequential_fixpoint_random():
    rng = np.random.default_rng(8)
    n = 40
    rows = [(f"v{int(a)}", f"v{int(b)}", int(t))
            for a, b, t in np.c_[rng.integers(0, n, 300),
                                 rng.integers(0, n, 300),
                                 rng.integers(0, 50, 300)]]
    seeds = [("v0", 0), ("v7", 10)]
    out, _ = earliest_arrival(_e(rows), seeds)
    got = dict(zip(out.to_pandas().v, out.to_pandas().arrival))
    assert got == _seq_oracle(rows, seeds)


def test_later_seed_blocks_earlier_edges():
    rows = [("a", "b", 5)]
    out, _ = earliest_arrival(_e(rows), [("a", 6)])
    got = dict(zip(out.to_pandas().v, out.to_pandas().arrival))
    assert got == {"a": 6}  # edge at t=5 < seed start 6


def test_min_over_multiple_paths():
    rows = [("s", "a", 2), ("s", "b", 1), ("a", "t", 4), ("b", "t", 3)]
    out, _ = earliest_arrival(_e(rows), [("s", 0)])
    got = dict(zip(out.to_pandas().v, out.to_pandas().arrival))
    assert got["t"] == 3


def test_layout_invariance_and_validation():
    rng = np.random.default_rng(3)
    rows = [(f"v{int(a)}", f"v{int(b)}", int(t))
            for a, b, t in np.c_[rng.integers(0, 25, 150),
                                 rng.integers(0, 25, 150),
                                 rng.integers(0, 30, 150)]]
    a, _ = earliest_arrival(_e(rows), [("v1", 0)])
    b, _ = earliest_arrival(_e(rows).repartition(7), [("v1", 0)])
    pa_ = a.to_pandas().sort_values("v").reset_index(drop=True)
    pb_ = b.to_pandas().sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb_)
    with pytest.raises(ValueError):
        earliest_arrival(_e(rows), [])

"""node2vec walks: pure-Python protocol replay oracle + transition law."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.node2vec import (_draw_u64, _uniform,
                                                     node2vec_walks)


def replay(adj, starts, walk_len, p, q, seed, max_tries=64):
    """Mirror of the distributed protocol, one walker at a time."""
    ip, iq = 1.0 / p, 1.0 / q
    M = max(ip, 1.0, iq)
    sets = {v: set(ns) for v, ns in adj.items()}
    rows = []
    for wid, s0 in enumerate(starts):
        rows.append((wid, 0, s0))
        prev, cur = -1, s0
        for step in range(walk_len - 1):
            nbrs = adj.get(cur, [])
            if not nbrs:
                break
            t = 0
            moved = False
            while True:
                w = np.array([wid], dtype=np.int64)
                st = np.array([step], dtype=np.int64)
                tt = np.array([t], dtype=np.int64)
                hc = _draw_u64(w, st, tt, seed + 3)
                x = nbrs[int(hc[0] % np.uint64(len(nbrs)))]
                u = float(_uniform(_draw_u64(w, st, tt, seed),
                                   seed + 7)[0])
                if M == 1.0 or prev < 0 or t >= max_tries:
                    accept = True
                elif x == prev:
                    accept = u < ip / M
                else:
                    alpha = 1.0 if x in sets.get(prev, set()) else iq
                    accept = u < alpha / M
                if accept:
                    prev, cur = cur, x
                    rows.append((wid, step + 1, cur))
                    moved = True
                    break
                t += 1
        if not moved and walk_len > 1:
            pass
    return sorted(rows)


def _run(adj, n, starts, tmp, tag, parts=1, actors=0, **kw):
    src = np.array([a for a, ns in adj.items() for _ in ns],
                   dtype=np.int64)
    dst = np.array([b for _, ns in adj.items() for b in ns],
                   dtype=np.int64)
    edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    offsets = (np.array([0, n], dtype=np.int64) if parts == 1 else
               np.unique(np.linspace(0, n, parts + 1).astype(np.int64)))
    ds, info = node2vec_walks(
        edges, offsets, str(tmp / tag),
        starts=np.asarray(starts, dtype=np.int64),
        num_actors=actors, **kw)
    df = ds.to_pandas()
    return sorted(zip(df.walk_id, df.step, df.vid)), info


@pytest.mark.parametrize("pq", [(0.5, 2.0), (1.0, 1.0), (4.0, 0.25)])
@pytest.mark.parametrize("parts,actors", [(1, 0), (4, 3)])
def test_matches_replay(tmp_path, pq, parts, actors):
    p, q = pq
    rng = np.random.default_rng(1)
    n = 50
    m = rng.random((n, n)) < 0.12
    np.fill_diagonal(m, False)
    adj = {v: sorted(np.flatnonzero(m[v]).tolist()) for v in range(n)}
    starts = list(range(n))
    got, _ = _run(adj, n, starts, tmp_path,
                  f"r{p}_{q}_{parts}_{actors}", parts=parts,
                  actors=actors, p=p, q=q, walk_len=6, seed=9)
    exp = replay(adj, starts, 6, p, q, 9)
    assert got == exp, (p, q, parts, actors)


def test_transition_law(tmp_path):
    # 0 -> 1; from 1 (prev=0): candidates {0 (return), 2, 3 (outward)}
    adj = {0: [1], 1: [0, 2, 3], 2: [1], 3: [1]}
    p, q = 0.25, 4.0
    n_walks = 3000
    starts = [0] * n_walks
    got, _ = _run(adj, 4, starts, tmp_path, "law", p=p, q=q,
                  walk_len=3, seed=5)
    df = pd.DataFrame(got, columns=["wid", "step", "vid"])
    second = df[df.step == 2].vid.value_counts(normalize=True)
    # alpha weights {0: 1/p=4, 2: 1/q=0.25, 3: 1/q=0.25} -> 8/9, 1/18, 1/18
    assert abs(second.get(0, 0) - 8 / 9) < 0.03
    assert abs(second.get(2, 0) - 1 / 18) < 0.02
    assert abs(second.get(3, 0) - 1 / 18) < 0.02


def test_dangling_and_validation(tmp_path):
    adj = {0: [1], 1: []}  # walk ends at 1
    got, info = _run(adj, 2, [0], tmp_path, "dang", p=0.5, q=2.0,
                     walk_len=5, seed=3)
    assert got == [(0, 0, 0), (0, 1, 1)]
    edges = rd.from_pandas(pd.DataFrame(
        {"src": np.array([0], dtype=np.int64),
         "dst": np.array([1], dtype=np.int64)}))
    off = np.array([0, 2], dtype=np.int64)
    with pytest.raises(ValueError, match="positive"):
        node2vec_walks(edges, off, str(tmp_path / "v"), p=0.0)
    with pytest.raises(ValueError, match="walk_len"):
        node2vec_walks(edges, off, str(tmp_path / "v2"), walk_len=0)

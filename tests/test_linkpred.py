"""End-to-end link-prediction evaluation (graph/linkpred.py): scorer-glue
oracle, quality on planted community structure, layout independence,
validation.  Mirrors the reference's protocol
(link_prediction.py:33-106) with the node2vec/SGNS scorer."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.linkpred import link_prediction_auc


def _community_graph(n_blocks=4, block=16, intra_pct=50, seed=5):
    """Deterministic planted-partition digraph: ~intra_pct% of ordered
    intra-block pairs are edges; one cross edge per adjacent block pair
    keeps it connected.  Dense-id vertex space [0, n_blocks*block)."""
    n = n_blocks * block
    rng = np.random.default_rng(seed)
    src, dst = [], []
    for b in range(n_blocks):
        lo = b * block
        for u in range(lo, lo + block):
            for v in range(lo, lo + block):
                if u != v and rng.integers(0, 100) < intra_pct:
                    src.append(u)
                    dst.append(v)
    for b in range(n_blocks - 1):
        src.append(b * block)
        dst.append((b + 1) * block)
        src.append((b + 1) * block + 1)
        dst.append(b * block + 1)
    t = pa.table({"src": pa.array(src, type=pa.int64()),
                  "dst": pa.array(dst, type=pa.int64())})
    return rd.from_arrow(t), n


@pytest.fixture(scope="module")
def comm_graph():
    return _community_graph()


def test_auc_beats_chance_on_planted_structure(comm_graph, tmp_path):
    """Held-out intra-community edges must outscore random non-edges
    (mostly cross-community) by a wide margin — the embedding has to
    have learned the partition for this to pass."""
    edges, n = comm_graph
    offsets = np.array([0, n], dtype=np.int64)
    auc, scored, info = link_prediction_auc(
        edges, offsets, str(tmp_path / "q"), seed=11, dim=16, epochs=6,
        lr=0.2, walks_per_vertex=6, walk_len=8, window=2, num_parts=4)
    assert 0.0 <= auc <= 1.0
    assert auc > 0.80, info["n_test"]
    assert info["n_test"] > 0 and info["n_neg"] > 0
    # reference ratio 2.0 (within negative_sample's rounding)
    assert info["n_neg"] == 2 * info["n_test"]


def test_scores_match_numpy_replay(comm_graph, tmp_path):
    """The scoring map (broadcast searchsorted + dot) must equal a
    driver-side numpy recompute from the returned embedding table."""
    edges, n = comm_graph
    offsets = np.array([0, n], dtype=np.int64)
    _, scored, info = link_prediction_auc(
        edges, offsets, str(tmp_path / "r"), seed=3, dim=8, epochs=1,
        walks_per_vertex=2, num_parts=4)
    toks, w = info["tokens"], info["w_in"].astype(np.float64)
    df = scored.to_pandas()
    ix_s = np.searchsorted(toks, df.src.to_numpy())
    ix_d = np.searchsorted(toks, df.dst.to_numpy())
    assert (toks[ix_s] == df.src.to_numpy()).all()
    assert (toks[ix_d] == df.dst.to_numpy()).all()
    want = np.round((w[ix_s] * w[ix_d]).sum(axis=1), 6)
    assert np.allclose(df.score.to_numpy(), want, atol=1e-12)
    # labels: positives are real edges, negatives are not
    es = set(zip(*[c.to_numpy().tolist()
                   for c in [edges.to_pandas().src, edges.to_pandas().dst]]))
    pos = df[df.lab == 1]
    neg = df[df.lab == 0]
    assert all((a, b) in es for a, b in zip(pos.src, pos.dst))
    assert all((a, b) not in es for a, b in zip(neg.src, neg.dst))
    assert all(a != b for a, b in zip(neg.src, neg.dst))


def test_layout_independent(comm_graph, tmp_path):
    """Same seed, different graph partitioning/actor layout ->
    bitwise-same AUC and per-pair scores (every stage is stateless-hash
    or replay-deterministic).  `num_parts` stays fixed: the SGNS model
    is a deterministic function of the pair-shard count (per-shard
    sequential SGD), so that knob is a hyperparameter, not layout."""
    edges, n = comm_graph
    got = []
    for tag, cuts, na in (("a", [0, n], 1),
                          ("b", [0, n // 3, n], 3)):
        offsets = np.array(cuts, dtype=np.int64)
        auc, scored, _ = link_prediction_auc(
            edges, offsets, str(tmp_path / tag), seed=23, dim=8,
            epochs=1, walks_per_vertex=2, num_parts=4, num_actors=na)
        df = scored.to_pandas().sort_values(
            ["src", "dst"]).reset_index(drop=True)
        got.append((auc, df))
    assert got[0][0] == got[1][0]
    a, b = got[0][1], got[1][1]
    assert (a.src.to_numpy() == b.src.to_numpy()).all()
    assert (a.score.to_numpy() == b.score.to_numpy()).all()


def test_validation():
    t = rd.from_arrow(pa.table({"src": pa.array([0], type=pa.int64()),
                                "dst": pa.array([1], type=pa.int64())}))
    offsets = np.array([0, 2], dtype=np.int64)
    with pytest.raises(ValueError, match="test_frac"):
        link_prediction_auc(t, offsets, "/tmp/x", test_frac=0.0)
    with pytest.raises(ValueError, match="neg_ratio"):
        link_prediction_auc(t, offsets, "/tmp/x", neg_ratio=0)

"""SGNS trainer (functions/word2vec.py) — replay-oracle parity,
partitioning invariance, semantic quality, validation.

The replay oracle below reimplements the FULL distributed protocol in
sequential pure Python/NumPy — hash sharding, in-shard sort, per-epoch
per-occurrence negative draws, per-minibatch batch-start-gradient
updates (dict accumulation, not np.add.at), example-weighted model
averaging — sharing only the certified hash primitives with the
engine.  allclose 1e-6 per the r3 VERDICT done-criterion."""
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from halvesting_geometric_ray.functions.hashing import stable_hash_cols64


def _mk_pairs(n=600, seed=0):
    """Two token communities (0..4, 10..14) with heavy in-community
    co-occurrence and a few cross pairs."""
    rng = np.random.default_rng(seed)
    comm = rng.integers(0, 2, n)
    base = np.where(comm == 0, 0, 10)
    c = base + rng.integers(0, 5, n)
    x = base + rng.integers(0, 5, n)
    cross = rng.random(n) < 0.05
    x = np.where(cross, (10 - base) + rng.integers(0, 5, n), x)
    df = pd.DataFrame({"pid": np.arange(n, dtype=np.int64),
                       "center": c.astype(np.int64),
                       "context": x.astype(np.int64)})
    tok, cnt = np.unique(np.concatenate([c, x]), return_counts=True)
    vocab = pd.DataFrame({"token": tok.astype(np.int64),
                          "n": cnt.astype(np.int64)})
    return df, vocab


def _oracle_sgns(df, vocab, *, id_cols, dim, negatives, power, lr,
                 epochs, seed, num_parts, inner_batch):
    toks = np.sort(vocab["token"].to_numpy().astype(np.int64))
    w = vocab.set_index("token").loc[toks, "n"].to_numpy().astype(
        np.float64) ** power
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    V = toks.size
    rng = np.random.default_rng(seed)
    w_in = ((rng.random((V, dim)) - 0.5) / dim).astype(np.float32)
    w_out = np.zeros((V, dim), dtype=np.float32)
    part = stable_hash_cols64(
        [df[c].to_numpy() for c in id_cols], seed=seed + 101) % num_parts
    n_total = len(df)
    for ep in range(epochs):
        acc_in = np.zeros((V, dim))
        acc_out = np.zeros((V, dim))
        for p in range(num_parts):
            sub = df[part == p].sort_values(list(id_cols),
                                            kind="mergesort")
            if not len(sub):
                continue
            base = stable_hash_cols64(
                [sub[c].to_numpy() for c in id_cols],
                seed=seed + 7919 * (ep + 1)).astype(np.uint64)
            cen = np.searchsorted(toks, sub["center"].to_numpy())
            ctx = np.searchsorted(toks, sub["context"].to_numpy())
            negs = np.empty((len(sub), negatives), dtype=np.int64)
            for slot in range(negatives):
                with np.errstate(over="ignore"):
                    h = base * np.uint64(0x9E3779B97F4A7C15) + np.uint64(
                        slot * 2 + 1)
                    h ^= h >> np.uint64(31)
                    h *= np.uint64(0xBF58476D1CE4E5B9)
                    h ^= h >> np.uint64(27)
                u = (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53
                negs[:, slot] = np.minimum(
                    np.searchsorted(cdf, u, side="right"), V - 1)
            d_in: dict = {}
            d_out: dict = {}

            def g_in(i):
                return w_in[i].astype(np.float64) + d_in.get(i, 0.0)

            def g_out(i):
                return w_out[i].astype(np.float64) + d_out.get(i, 0.0)

            m = len(sub)
            for s in range(0, m, inner_batch):
                upd_in: dict = {}
                upd_out: dict = {}
                for r in range(s, min(s + inner_batch, m)):
                    h_vec = g_in(cen[r])
                    targets = [int(ctx[r])] + [int(t) for t in negs[r]]
                    labels = [1.0] + [0.0] * negatives
                    dh = np.zeros(dim)
                    for t, lab in zip(targets, labels):
                        v = g_out(t)
                        sco = 1.0 / (1.0 + np.exp(-float(h_vec @ v)))
                        g = lr * (lab - sco)
                        dh += g * v
                        upd_out[t] = upd_out.get(t, 0.0) + g * h_vec
                    upd_in[int(cen[r])] = upd_in.get(int(cen[r]), 0.0) + dh
                for i, v in upd_in.items():
                    d_in[i] = d_in.get(i, 0.0) + v
                for i, v in upd_out.items():
                    d_out[i] = d_out.get(i, 0.0) + v
            for i, v in d_in.items():
                acc_in[i] += m * v
            for i, v in d_out.items():
                acc_out[i] += m * v
        w_in = (w_in.astype(np.float64) + acc_in / n_total).astype(
            np.float32)
        w_out = (w_out.astype(np.float64) + acc_out / n_total).astype(
            np.float32)
    return toks, w_in, w_out


HP = dict(id_cols=("pid",), dim=8, negatives=3, power=0.75, lr=0.05,
          epochs=2, seed=5, num_parts=4, inner_batch=16)


def test_sgns_matches_sequential_replay(ray_session):
    from halvesting_geometric_ray.functions.word2vec import sgns_train

    df, vocab = _mk_pairs()
    toks, w_in, w_out, info = sgns_train(rd.from_pandas(df), vocab, **HP)
    o_toks, o_in, o_out = _oracle_sgns(df, vocab, **HP)
    assert np.array_equal(toks, o_toks)
    assert info["n_pairs"] == len(df)
    assert np.allclose(w_in, o_in, atol=1e-6)
    assert np.allclose(w_out, o_out, atol=1e-6)
    # training moved the weights (not a no-op fixture)
    assert info["epochs"][0]["mean_abs_update"] > 0


def test_sgns_partitioning_invariant(ray_session):
    from halvesting_geometric_ray.functions.word2vec import sgns_train

    df, vocab = _mk_pairs(seed=3)
    _, a_in, a_out, _ = sgns_train(
        rd.from_pandas(df).repartition(2), vocab, **HP)
    _, b_in, b_out, _ = sgns_train(
        rd.from_pandas(df).repartition(7), vocab, **HP)
    assert np.allclose(a_in, b_in, atol=1e-6)
    assert np.allclose(a_out, b_out, atol=1e-6)


def test_sgns_learns_community_structure(ray_session):
    from halvesting_geometric_ray.functions.word2vec import sgns_train

    df, vocab = _mk_pairs(n=2000, seed=1)
    toks, w_in, _, _ = sgns_train(
        rd.from_pandas(df), vocab, id_cols=("pid",), dim=16,
        negatives=4, lr=0.2, epochs=6, seed=2, num_parts=4,
        inner_batch=32)
    e = w_in / np.linalg.norm(w_in, axis=1, keepdims=True)
    sim = e @ e.T
    in_comm = (toks[:, None] < 5) == (toks[None, :] < 5)
    off = ~np.eye(len(toks), dtype=bool)
    within = sim[in_comm & off].mean()
    cross = sim[~in_comm].mean()
    assert within > cross + 0.1, (within, cross)


def test_sgns_validation(ray_session):
    from halvesting_geometric_ray.functions.word2vec import sgns_train

    df, vocab = _mk_pairs(n=50)
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError):
        sgns_train(ds, vocab, id_cols=("pid",), dim=0)
    with pytest.raises(ValueError):
        sgns_train(ds, vocab, id_cols=("pid",), epochs=0)
    with pytest.raises(ValueError):
        sgns_train(ds, vocab.iloc[:0], id_cols=("pid",))
    with pytest.raises(Exception, match="missing from vocab"):
        sgns_train(ds, vocab[vocab.token != int(df.center[0])],
                   id_cols=("pid",), epochs=1)


def test_embeddings_dataset_feeds_clustering(ray_session):
    from halvesting_geometric_ray.functions.clustering import kmeans_assign
    from halvesting_geometric_ray.functions.word2vec import (
        embeddings_dataset, sgns_train)

    df, vocab = _mk_pairs(n=400, seed=9)
    toks, w_in, _, _ = sgns_train(rd.from_pandas(df), vocab, **HP)
    emb = embeddings_dataset(toks, w_in)
    cent = np.stack([w_in[toks < 5].mean(axis=0),
                     w_in[toks >= 5].mean(axis=0)]).astype(np.float64)
    out = kmeans_assign(emb, cent).to_pandas()
    assert len(out) == len(toks)
    assert set(out.columns) == {"vec_id", "cluster"}

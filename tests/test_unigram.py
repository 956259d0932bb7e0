"""Unigram-LM tokenizer: distributed EM vs an independent sequential
implementation of the same algorithm (Kudo 2018 with expected-count
pruning), plus Viterbi round-trip, likelihood monotonicity, layout
invariance and compositional-vocabulary recovery."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.unigram import (
    _PROB_FLOOR, apply_unigram, train_unigram)


def _mk_docs(words_counts, parallelism=4, shuffle_seed=None):
    """One doc per word occurrence (so corpus word counts = weights)."""
    texts = []
    for w, c in words_counts.items():
        texts.extend([w] * c)
    if shuffle_seed is not None:
        rng = np.random.default_rng(shuffle_seed)
        texts = [texts[i] for i in rng.permutation(len(texts))]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    return rd.from_arrow(t).repartition(parallelism)


# ---------------- sequential oracle (independent implementation) ----


def _oracle_seeds(wc, max_piece_len, seed_size):
    sub = {}
    for w, c in wc.items():
        for j in range(len(w)):
            for L in range(1, min(max_piece_len, len(w) - j) + 1):
                s = w[j:j + L]
                sub[s] = sub.get(s, 0) + c
    chars = sorted([s for s in sub if len(s) == 1])
    multi = [s for s in sub if len(s) > 1]
    multi.sort(key=lambda s: (-sub[s] * len(s), s))
    keep = chars + multi[:max(0, seed_size - len(chars))]
    keep.sort()
    return keep, np.array([float(sub[s]) for s in keep])


def _oracle_em(wc, vocab_size, seed_size, max_piece_len, em_rounds,
               prune_frac):
    pieces, counts = _oracle_seeds(wc, max_piece_len, seed_size)
    p = counts / counts.sum()
    p = np.maximum(p, _PROB_FLOOR)
    p /= p.sum()
    rnd = 0
    lls = []
    while True:
        vocab = {s: i for i, s in enumerate(pieces)}
        exp = np.zeros(len(pieces))
        ll = 0.0
        for w in sorted(wc):
            c = wc[w]
            n = len(w)
            a = np.zeros(n + 1)
            a[0] = 1.0
            for i in range(1, n + 1):
                for L in range(1, min(max_piece_len, i) + 1):
                    idx = vocab.get(w[i - L:i])
                    if idx is not None:
                        a[i] += a[i - L] * p[idx]
            Z = a[n]
            if Z <= 0:
                continue
            b = np.zeros(n + 1)
            b[n] = 1.0
            for i in range(n, 0, -1):
                if b[i] == 0:
                    continue
                for L in range(1, min(max_piece_len, i) + 1):
                    idx = vocab.get(w[i - L:i])
                    if idx is not None:
                        exp[idx] += c * a[i - L] * p[idx] * b[i] / Z
                        b[i - L] += p[idx] * b[i]
            ll += c * math.log(Z)
        lls.append(ll)
        p = np.maximum(exp / max(exp.sum(), 1e-300), _PROB_FLOOR)
        p /= p.sum()
        rnd += 1
        if rnd >= em_rounds and len(pieces) <= vocab_size:
            break
        if len(pieces) > vocab_size:
            target = max(vocab_size, int(len(pieces) * (1 - prune_frac)))
            order = sorted(range(len(pieces)),
                           key=lambda i: (len(pieces[i]) > 1, -exp[i],
                                          pieces[i]))
            multi = [i for i in order if len(pieces[i]) > 1]
            n_chars = len(pieces) - len(multi)
            kept = sorted([i for i in order if len(pieces[i]) == 1] +
                          multi[:max(0, target - n_chars)])
            pieces = [pieces[i] for i in kept]
            p = p[kept]
            p /= p.sum()
        if rnd >= em_rounds + 8:
            break
    df = pd.DataFrame({"piece": pieces, "logp": np.log(p)})
    return df.sort_values("piece").reset_index(drop=True), lls


WC = {"internet": 9, "interview": 7, "network": 11, "working": 5,
      "view": 13, "inter": 4, "net": 17, "work": 19, "king": 3,
      "viewer": 2}


def test_em_matches_sequential_oracle(ray_session):
    docs = _mk_docs(WC)
    got, info = train_unigram(docs, vocab_size=30, seed_size=120,
                              max_piece_len=6, em_rounds=3,
                              num_parts=5)
    want, lls = _oracle_em(WC, vocab_size=30, seed_size=120,
                           max_piece_len=6, em_rounds=3,
                           prune_frac=0.25)
    assert got["piece"].tolist() == want["piece"].tolist()
    np.testing.assert_allclose(got["logp"].to_numpy(),
                               want["logp"].to_numpy(), atol=1e-6)
    got_lls = [r["loglik"] for r in info["rounds"]]
    np.testing.assert_allclose(got_lls, lls, rtol=1e-9)


def test_loglik_monotone_without_pruning(ray_session):
    docs = _mk_docs(WC)
    _, info = train_unigram(docs, vocab_size=500, seed_size=120,
                            max_piece_len=6, em_rounds=4, num_parts=4)
    lls = [r["loglik"] for r in info["rounds"]]
    # no pruning (vocab_size > seed count) -> EM guarantees ascent
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:])), lls


def test_viterbi_reconstructs_text(ray_session):
    docs = _mk_docs(WC, parallelism=2)
    pieces, _ = train_unigram(docs, vocab_size=40, seed_size=150,
                              max_piece_len=6, em_rounds=2, num_parts=3)
    enc = apply_unigram(docs, pieces, id_col="doc_id").to_pandas()
    src = docs.to_pandas().set_index("doc_id")["text"]
    plist = pieces["piece"].tolist()
    for _, row in enc.iterrows():
        text = src[row["doc_id"]]
        decoded = "".join(plist[i] for i in row["ids"])
        assert decoded == text.replace(" ", "")
        assert row["n_tokens"] == len(row["ids"])


def test_layout_invariance_fixed_num_parts(ray_session):
    a, _ = train_unigram(_mk_docs(WC, parallelism=2), vocab_size=30,
                         seed_size=120, max_piece_len=6, em_rounds=2,
                         num_parts=4)
    b, _ = train_unigram(_mk_docs(WC, parallelism=9, shuffle_seed=3),
                         vocab_size=30, seed_size=120, max_piece_len=6,
                         em_rounds=2, num_parts=4)
    assert a["piece"].tolist() == b["piece"].tolist()
    assert (a["logp"].to_numpy() == b["logp"].to_numpy()).all()


def test_recovers_compositional_pieces(ray_session):
    rng = np.random.default_rng(4)
    parts = ["abc", "de", "fgh", "xy"]
    wc = {}
    for _ in range(40):
        w = "".join(rng.choice(parts) for _ in range(int(rng.integers(2, 4))))
        wc[w] = wc.get(w, 0) + int(rng.integers(1, 20))
    docs = _mk_docs(wc)
    pieces, _ = train_unigram(docs, vocab_size=20, seed_size=300,
                              max_piece_len=5, em_rounds=5, num_parts=4)
    multi = pieces[pieces["piece"].str.len() > 1]
    top = multi.sort_values("logp", ascending=False).head(6)
    assert set(parts).issubset(set(top["piece"]))


def test_unk_fallback(ray_session):
    docs = _mk_docs({"aa bb": 3})
    pieces, _ = train_unigram(docs, vocab_size=10, seed_size=20,
                              max_piece_len=3, em_rounds=1, num_parts=2)
    other = rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64()),
                                    "text": pa.array(["aa zz"])}))
    enc = apply_unigram(other, pieces).to_pandas()
    unk = len(pieces)
    ids = list(enc.loc[0, "ids"])
    assert ids.count(unk) == 2  # both 'z' chars unseen

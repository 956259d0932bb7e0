"""Unigram-LM cross-entropy scoring vs a pure-Python oracle."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.lm import lm_scores, unigram_model


def oracle_scores(texts, vocab_size, alpha):
    counts = Counter()
    for t in texts:
        counts.update(t.split())
    T = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vocab = dict(top)
    V = len(vocab)
    denom = T + alpha * (V + 1)
    out = []
    for t in texts:
        toks = t.split()
        if not toks:
            out.append((0, 0, 0.0))
            continue
        lp = 0.0
        oov = 0
        for w in toks:
            if w in vocab:
                lp += math.log((vocab[w] + alpha) / denom)
            else:
                oov += 1
                lp += math.log(alpha / denom)
        out.append((len(toks), oov, -lp / len(toks)))
    return out


def _run(texts, vocab_size=6, alpha=0.5, repartition=None):
    pdf = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                        "text": texts})
    ds = rd.from_pandas(pdf)
    if repartition:
        ds = ds.repartition(repartition)
    ref, info = unigram_model(ds, vocab_size=vocab_size, alpha=alpha)
    got = (lm_scores(ds, ref).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    return got, info


TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "the the the the",
    "zebra quokka axolotl",
    "",
    "cat dog cat dog cat",
]


def test_lm_matches_oracle():
    got, info = _run(TEXTS)
    exp = oracle_scores(TEXTS, 6, 0.5)
    for i, (n, oov, ce) in enumerate(exp):
        assert got.n_tokens[i] == n
        assert got.oov_tokens[i] == oov
        assert got.cross_entropy[i] == pytest.approx(ce, rel=1e-12)
    assert info["vocab_size"] == 6
    assert info["total_tokens"] == sum(len(t.split()) for t in TEXTS)


def test_lm_quality_ordering():
    """Common-word documents score lower cross-entropy than rare-word
    ones — the filtering property the operator exists for."""
    got, _ = _run(TEXTS, vocab_size=6)
    # doc 2 is all 'the' (most common) -> lowest CE among non-empty
    ces = got[got.n_tokens > 0].set_index("doc_id").cross_entropy
    assert ces.idxmin() == 2
    # doc 3 is all-OOV rare words -> highest CE
    assert ces.idxmax() == 3
    # top-6 vocab includes 'axolotl' via the (count desc, token asc)
    # tie-break, so exactly 2 of doc 3's rare words are OOV
    assert got.oov_tokens[3] == 2


def test_lm_partitioning_invariant():
    a, _ = _run(TEXTS, vocab_size=4)
    b, _ = _run(TEXTS, vocab_size=4, repartition=5)
    pd.testing.assert_frame_equal(a, b)


def test_lm_full_vocab_and_validation():
    got, info = _run(TEXTS, vocab_size=10000, alpha=1.0)
    exp = oracle_scores(TEXTS, 10000, 1.0)
    for i, (n, oov, ce) in enumerate(exp):
        assert got.cross_entropy[i] == pytest.approx(ce, rel=1e-12)
        assert got.oov_tokens[i] == 0 or got.n_tokens[i] == 0 or oov > 0
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["x"]}))
    with pytest.raises(ValueError):
        unigram_model(ds, vocab_size=0)
    with pytest.raises(ValueError):
        unigram_model(ds, alpha=0.0)


def test_compressibility_oracle_and_ordering():
    import zlib

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.functions.text import compressibility_batch

    texts = ["spam spam spam spam spam spam spam spam spam spam",
             "the quick brown fox jumps over one very lazy dog today",
             ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string())}))
    got = (ds.map_batches(compressibility_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, t in enumerate(texts):
        raw = t.encode()
        assert got.n_bytes[i] == len(raw)
        assert got.z_bytes[i] == (len(zlib.compress(raw, 6)) if raw else 0)
    # repetitive text compresses harder than prose; empty -> 0
    assert got.ratio_pct[0] < got.ratio_pct[1]
    assert got.ratio_pct[2] == 0


# ---- stupid-backoff bigram ---------------------------------------------

def bigram_oracle(texts, vocab_size, num_bigrams, alpha, seed=42):
    """Pure-Python replica of bigram_model + bigram_scores (incl. the
    hash-based top-B tie-break and UNK mapping)."""
    import pyarrow as pa

    from halvesting_geometric_ray.functions.hashing import stable_hash64

    counts = Counter()
    for t in texts:
        counts.update(t.split())
    T = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vocab = dict(top)
    V = len(vocab)
    denom = T + alpha * (V + 1)

    def uni_lp(h, w):
        if w in vocab:
            return math.log((vocab[w] + alpha) / denom)
        return math.log(alpha / denom)

    toks_all = sorted({w for t in texts for w in t.split()})
    hs = stable_hash64(pa.array(toks_all, type=pa.string()), seed=seed)
    h_of = dict(zip(toks_all, (int(x) for x in hs)))

    def mapped(w):
        return h_of[w] if w in vocab else -1

    pair_counts = Counter()
    for t in texts:
        toks = t.split()
        for a, b in zip(toks[:-1], toks[1:]):
            pair_counts[(mapped(a), mapped(b))] += 1
    c1 = Counter()
    for (p, _), n in pair_counts.items():
        c1[p] += n
    kept = sorted(pair_counts.items(),
                  key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:num_bigrams]
    logp12 = {k: math.log(n / c1[k[0]]) for k, n in kept}

    out = []
    for t in texts:
        toks = t.split()
        if not toks:
            out.append((0, 0, 0.0))
            continue
        lp = uni_lp(None, toks[0])
        hits = 0
        for a, b in zip(toks[:-1], toks[1:]):
            key = (mapped(a), mapped(b))
            if key in logp12:
                lp += logp12[key]
                hits += 1
            else:
                lp += math.log(0.4) + uni_lp(None, b)
        out.append((len(toks), hits, -lp / len(toks)))
    return out


def _bigram_corpus():
    return [
        "the cat sat on the mat and the cat slept",
        "the dog sat on the rug and the dog barked",
        "the cat sat on the rug",
        "quantum flux harmonics decay rapidly under observation",
        "the the the the",
        "",
        "single",
    ]


def test_bigram_matches_oracle():
    from halvesting_geometric_ray.functions.lm import (bigram_model,
                                                       bigram_scores)

    texts = _bigram_corpus()
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))
    for vs, nb in ((100, 1000), (6, 5)):
        ref, info = bigram_model(docs, vocab_size=vs, num_bigrams=nb,
                                 alpha=0.5)
        got = (bigram_scores(docs, ref).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        exp = bigram_oracle(texts, vs, nb, 0.5)
        for i, (n, hits, ce) in enumerate(exp):
            assert got.n_tokens[i] == n, (vs, nb, i)
            assert got.bigram_hits[i] == hits, (vs, nb, i)
            assert abs(got.cross_entropy[i] - ce) < 1e-12, (vs, nb, i)


def test_bigram_ordering_and_invariance():
    from halvesting_geometric_ray.functions.lm import (bigram_model,
                                                       bigram_scores)

    rng = np.random.default_rng(4)
    natural = ["the cat sat on the mat " * 6] * 10
    toks = ("the cat sat on the mat " * 6).split()
    shuffled = [" ".join(rng.permutation(toks)) for _ in range(10)]
    texts = natural + shuffled
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))
    ref, _ = bigram_model(docs, vocab_size=100, num_bigrams=1000)
    df = bigram_scores(docs, ref).to_pandas().sort_values("doc_id")
    nat = df.cross_entropy[:10].mean()
    shuf = df.cross_entropy[10:].mean()
    assert nat < shuf  # sequence model rewards real word order
    # partitioning invariance
    df4 = (bigram_scores(docs.repartition(4), ref).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert np.allclose(df.reset_index(drop=True).cross_entropy,
                       df4.cross_entropy, atol=0)


def test_bigram_validation():
    from halvesting_geometric_ray.functions.lm import bigram_model

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([0], dtype=np.int64), "text": ["a b"]}))
    with pytest.raises(ValueError, match="num_bigrams"):
        bigram_model(docs, num_bigrams=0)


# ---- DSIR importance weights --------------------------------------------

def test_dsir_matches_oracle_and_separates():
    from halvesting_geometric_ray.functions.lm import (dsir_log_weights,
                                                       unigram_model)

    eng = ["the quick brown fox jumps over the lazy dog",
           "a stitch in time saves nine every single day",
           "the rain in spain stays mainly on the plain"]
    num = ["12 44 97 31 55 60 42 88 19 77",
           "3 1 4 1 5 9 2 6 5 3 5 8 9 7",
           "100 200 300 400 500 600 700 800"]
    corpus = eng + num
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(corpus), dtype=np.int64),
         "text": corpus}))
    target_docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(2, dtype=np.int64), "text": eng[:2]}))
    t_ref, _ = unigram_model(target_docs, vocab_size=100, alpha=0.5)
    r_ref, _ = unigram_model(docs, vocab_size=100, alpha=0.5)
    got = (dsir_log_weights(docs, t_ref, r_ref).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # exact oracle: logw = n * (ce_raw - ce_target) per doc
    exp_t = oracle_scores(eng[:2], 100, 0.5)
    # target model scores the FULL corpus; replicate via model terms
    t_scores = {}
    # reuse oracle machinery: score corpus docs under the target model
    counts = Counter()
    for t in eng[:2]:
        counts.update(t.split())
    T = sum(counts.values())
    V = len(counts)
    denom = T + 0.5 * (V + 1)

    def lp_t(w):
        return math.log((counts[w] + 0.5) / denom) if w in counts \
            else math.log(0.5 / denom)

    raw = oracle_scores(corpus, 100, 0.5)
    for i, t in enumerate(corpus):
        toks = t.split()
        logw = sum(lp_t(w) for w in toks) - (-raw[i][2] * raw[i][0])
        assert abs(got.log_weight[i] - logw) < 1e-10, i
    # separation: every english doc outweighs every numeric doc
    assert got.log_weight[:3].min() > got.log_weight[3:].max()
    # composes with weighted_sample: resampling favors target-like docs
    from halvesting_geometric_ray.ops.sample import weighted_sample

    wdf = got.copy()
    wdf["w"] = np.exp(wdf.log_weight - wdf.log_weight.max())
    pick = weighted_sample(rd.from_pandas(wdf), "doc_id", "w", 2,
                           seed=11).to_pandas()
    # in-target docs carry overwhelming weight (deterministic draw)
    assert set(pick.doc_id) <= {0, 1, 2}

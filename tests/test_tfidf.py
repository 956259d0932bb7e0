"""TF-IDF: tf/df vs DuckDB string_split oracle; top-k vs pure Python."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.tfidf import term_doc_stats, tfidf_topk

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]


def _docs(n=120, seed=9):
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(WORDS, rng.integers(3, 40)))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _duck(pdf, sql):
    con = duckdb.connect()
    con.register("d", pdf)
    return con.execute(sql).fetchdf()


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if not pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_tf_df_match_duckdb():
    pdf = _docs()
    tf, df = term_doc_stats(rd.from_pandas(pdf).repartition(5))
    got_tf = tf.to_pandas()
    got_df = df.to_pandas()
    exp_tf = _duck(pdf, """
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM d""")
    exp_tf = (exp_tf[exp_tf.term != ""].groupby(["doc_id", "term"])
              .size().rename("tf").reset_index())
    pd.testing.assert_frame_equal(_norm(got_tf), _norm(exp_tf),
                                  check_dtype=False)
    exp_df = (exp_tf.groupby("term").doc_id.nunique().rename("df")
              .reset_index())
    pd.testing.assert_frame_equal(_norm(got_df), _norm(exp_df),
                                  check_dtype=False)


def _py_topk(pdf, k):
    n = len(pdf)
    tf = {}
    dfc = {}
    for _, r in pdf.iterrows():
        counts = {}
        for w in r.text.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
        tf[r.doc_id] = counts
        for w in counts:
            dfc[w] = dfc.get(w, 0) + 1
    rows = []
    for d, counts in tf.items():
        scored = sorted(
            ((c * math.log(n / dfc[w]), w) for w, c in counts.items()),
            key=lambda t: (-t[0], t[1]))
        for i, (s, w) in enumerate(scored[:k], 1):
            rows.append((d, w, i, s))
    return pd.DataFrame(rows, columns=["doc_id", "term", "rnk", "score"])


def test_topk_matches_python_oracle():
    pdf = _docs()
    got = (tfidf_topk(rd.from_pandas(pdf).repartition(4), k=3)
           .to_pandas().sort_values(["doc_id", "rnk"])
           .reset_index(drop=True))
    exp = (_py_topk(pdf, 3).sort_values(["doc_id", "rnk"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["doc_id", "term", "rnk"]], exp[["doc_id", "term", "rnk"]],
        check_dtype=False)
    assert np.allclose(got.score.to_numpy(), exp.score.to_numpy(),
                       rtol=1e-12)


def test_topk_partitioning_invariance():
    pdf = _docs(60, seed=3)
    a = _norm(tfidf_topk(rd.from_pandas(pdf).repartition(1), k=2)
              .to_pandas().drop(columns=["score"]))
    b = _norm(tfidf_topk(rd.from_pandas(pdf).repartition(9), k=2)
              .to_pandas().drop(columns=["score"]))
    pd.testing.assert_frame_equal(a, b)


def test_topk_validation():
    with pytest.raises(ValueError):
        tfidf_topk(rd.from_pandas(_docs(5)), k=0)


def _py_bm25(pdf, q, k1=1.2, b=0.75):
    n = len(pdf)
    tf, dfc, dls = {}, {}, {}
    for _, r in pdf.iterrows():
        counts = {}
        for w in r.text.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
        tf[r.doc_id] = counts
        dls[r.doc_id] = sum(counts.values())
        for w in counts:
            dfc[w] = dfc.get(w, 0) + 1
    avgdl = sum(dls.values()) / n
    out = {}
    for d, counts in tf.items():
        s = 0.0
        for w in set(q):
            c = counts.get(w, 0)
            if c:
                idf = math.log((n - dfc.get(w, 0) + 0.5)
                               / (dfc.get(w, 0) + 0.5) + 1)
                s += idf * c * (k1 + 1) / (c + k1 * (1 - b + b * dls[d] / avgdl))
        out[d] = s
    return out


def test_bm25_matches_python_oracle():
    from halvesting_geometric_ray.functions.tfidf import bm25_scores

    pdf = _docs(80, seed=17)
    q = ["alpha", "zeta", "notinvocab"]
    got = (bm25_scores(rd.from_pandas(pdf).repartition(5), q)
           .to_pandas().set_index("doc_id").score)
    exp = _py_bm25(pdf, q)
    assert len(got) == len(pdf)
    for d, s in exp.items():
        assert abs(got[d] - s) < 1e-9, (d, got[d], s)


def test_bm25_validation():
    from halvesting_geometric_ray.functions.tfidf import bm25_scores

    ds = rd.from_pandas(_docs(5))
    with pytest.raises(ValueError):
        bm25_scores(ds, [])
    with pytest.raises(ValueError):
        bm25_scores(ds, ["alpha"], b=1.5)

"""kneser_ney_bigrams vs a sequential reference implementation and
DuckDB (the sf0.01 path is swept by the gate replica)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.lm import kneser_ney_bigrams


def _ref_kn(texts, discount=0.75, min_count=1):
    """Sequential interpolated-KN reference (textbook formulas)."""
    from collections import Counter, defaultdict

    bg = Counter()
    for t in texts:
        toks = t.split(" ")
        for a, b in zip(toks[:-1], toks[1:]):
            bg[(a, b)] += 1
    cw1 = Counter()
    nf = Counter()
    nr = Counter()
    for (a, b), c in bg.items():
        cw1[a] += c
        nf[a] += 1
        nr[b] += 1
    n_types = float(len(bg))
    out = {}
    for (a, b), c in bg.items():
        if c < min_count:
            continue
        p = (max(c - discount, 0.0) / cw1[a]
             + discount * nf[a] / cw1[a] * (nr[b] / n_types))
        out[(a, b)] = (c, p)
    return out


def _texts(n=300, seed=13):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    return [" ".join(rng.choice(vocab, size=rng.integers(2, 30)))
            for _ in range(n)]


def test_matches_sequential_reference():
    texts = _texts()
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    out = kneser_ney_bigrams(ds, min_count=1).to_pandas()
    ref = _ref_kn(texts)
    assert len(out) == len(ref)
    for row in out.itertuples():
        c, p = ref[(row.w1, row.w2)]
        assert row.c == c
        assert row.p_kn == pytest.approx(p, abs=2e-9)


def test_probabilities_sum_to_one_per_context():
    # with min_count=1 (no filtering), sum over w2 of P(w2|w1) over the
    # OBSERVED successors equals 1 - D * Nf(w1)/c(w1.) * (1 - sum of
    # observed Pcont); with every w2 observed somewhere the total
    # leftover mass equals the unseen-continuation mass -> check the
    # exact identity sum_observed = (cw1 - D*Nf)/cw1 + D*Nf/cw1 * S
    # where S = sum of Pcont over observed successors.
    texts = _texts(120, seed=4)
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    out = kneser_ney_bigrams(ds, min_count=1, round_to=15).to_pandas()
    ref = _ref_kn(texts)
    n_types = float(len(ref))
    from collections import Counter

    nr = Counter()
    cw1 = Counter()
    nf = Counter()
    for (a, b), (c, _p) in ref.items():
        nr[b] += 1
        cw1[a] += c
        nf[a] += 1
    for w1, grp in out.groupby("w1"):
        s_cont = sum(nr[b] for b in grp.w2) / n_types
        expected = ((cw1[w1] - 0.75 * nf[w1]) / cw1[w1]
                    + 0.75 * nf[w1] / cw1[w1] * s_cont)
        assert grp.p_kn.sum() == pytest.approx(expected, abs=1e-9)


def test_matches_duckdb_hash_semantics():
    texts = _texts(200, seed=9)
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = kneser_ney_bigrams(
        rd.from_pandas(pdf), min_count=3).to_pandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = con.execute("""
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        FROM documents),
      bg AS (SELECT t1.tok AS w1, t2.tok AS w2, count(*) AS c
        FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id
        AND t2.pos = t1.pos + 1 GROUP BY 1, 2),
      lt AS (SELECT w1, CAST(sum(c) AS DOUBLE) AS cw1,
        count(*) AS n1p_fwd FROM bg GROUP BY w1),
      rt AS (SELECT w2, count(*) AS n1p_rev FROM bg GROUP BY w2),
      tt AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM bg)
      SELECT bg.w1, bg.w2, CAST(bg.c AS BIGINT) AS c,
      round(greatest(bg.c - 0.75, 0) / lt.cw1
      + 0.75 * lt.n1p_fwd / lt.cw1 * (rt.n1p_rev / tt.n_types), 9)
      AS p_kn
      FROM bg JOIN lt USING (w1) JOIN rt USING (w2) CROSS JOIN tt
      WHERE bg.c >= 3""").fetchdf()
    key = ["w1", "w2", "c", "p_kn"]
    a = out[key].sort_values(["w1", "w2"]).reset_index(drop=True)
    b = exp[key].sort_values(["w1", "w2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_validation_and_empty_docs():
    ds = rd.from_pandas(pd.DataFrame({"text": ["", "solo", "a b"]}))
    out = kneser_ney_bigrams(ds, min_count=1).to_pandas()
    # only "a b" produces a bigram; P = (1-.75)/1 + .75*1/1*(1/1) = 1.0
    assert len(out) == 1 and out.p_kn[0] == 1.0
    with pytest.raises(ValueError):
        kneser_ney_bigrams(ds, discount=1.5)

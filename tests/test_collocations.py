"""PMI collocations (functions/collocations.py) vs a pure-Python
counting oracle and the registered DuckDB SQL at gate scale."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.collocations import pmi_pairs


def _oracle(texts, window, min_count):
    uni, pairs = Counter(), Counter()
    n_tok = n_pair = 0
    for t in texts:
        ts = t.split(" ")
        uni.update(ts)
        n_tok += len(ts)
        for i in range(len(ts)):
            for k in range(1, window + 1):
                if i + k >= len(ts):
                    break
                a, b = ts[i], ts[i + k]
                if a == b:
                    continue
                pairs[(min(a, b), max(a, b))] += 1
                n_pair += 1
    out = {}
    for (a, b), c in pairs.items():
        if c >= min_count:
            out[(a, b)] = (c, round(math.log(
                (c / n_pair) / ((uni[a] / n_tok) * (uni[b] / n_tok))), 6))
    return out


def _run(texts, window=2, min_count=1, num_parts=16):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(texts)),
                                      "text": texts}))
    got = pmi_pairs(ds, text_col="text", window=window,
                    min_count=min_count, num_parts=num_parts).to_pandas()
    return {(r.a, r.b): (r.n_ab, r.pmi) for r in got.itertuples()}


def test_matches_python_oracle_crafted():
    texts = ["new york new york city", "york new haven", "a b a b c",
             "", "single"]
    for window in (1, 2, 3):
        got = _run(texts, window=window)
        want = _oracle(texts, window, 1)
        assert got == want


def test_min_count_and_high_pmi_phrase():
    # 'ice cream' always adjacent; 'the' everywhere -> PMI(ice,cream)
    # must dominate PMI(the, anything)
    texts = ["the ice cream is the best ice cream"] * 3 \
        + ["the dog saw the cat"] * 3
    got = _run(texts, window=2, min_count=3)
    want = _oracle(texts, 2, 3)
    assert got == want
    assert got[("cream", "ice")][1] > got[("best", "the")][1]


def test_partitioning_invariance_random():
    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(5, 40)))
             for _ in range(200)]
    a = _run(texts, window=2, min_count=2, num_parts=3)
    b = _run(texts, window=2, min_count=2, num_parts=16)
    assert a == b == _oracle(texts, 2, 2)


def test_validation_and_empty():
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["x y"]}))
    with pytest.raises(ValueError):
        pmi_pairs(ds, window=0)


def test_gate_query_duckdb_parity():
    import duckdb

    from halvesting_geometric_ray.queries_text import ORACLE, QUERIES

    got = QUERIES["q_pmi_collocations"]("/root/testdata/sf0.001")
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                "'/root/testdata/sf0.001/documents.parquet')")
    want = con.execute(ORACLE["q_pmi_collocations"]).fetchdf()
    assert len(want) > 10  # fixture must exercise the operator
    g = got.sort_values(["a", "b"]).reset_index(drop=True)
    w = want.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w[g.columns], check_dtype=False)

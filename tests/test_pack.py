"""Sequence packing manifest vs a DuckDB window-function oracle and
invariant checks."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.hashing import stable_hash64
from halvesting_geometric_ray.functions.pack import pack_sequences

SEQ = 16


def _docs(texts):
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})


def _run(pdf, seq_len=SEQ, num_bins=4, **kw):
    ds = rd.from_pandas(pdf)
    got = (pack_sequences(ds, seq_len, num_bins=num_bins, **kw)
           .to_pandas()
           .sort_values(["bin", "seq_id", "doc_id", "doc_tok_start"])
           .reset_index(drop=True))
    return got


def duck_oracle(pdf, seq_len, num_bins, bins):
    """Same semantics in SQL: per-bin ordered cumsum, one row per
    (doc, sequence) via generate_series over the crossed sequences."""
    base = pd.DataFrame({
        "doc_id": pdf.doc_id,
        "n_tokens": pdf.text.str.split().str.len().fillna(0).astype(int),
        "bin": bins,
    })
    con = duckdb.connect()
    con.register("docs", base)
    return con.execute(f"""
        WITH c AS (
          SELECT bin, doc_id, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY bin ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS e
          FROM docs WHERE n_tokens > 0),
        t AS (SELECT bin, max(e) AS total FROM c GROUP BY bin),
        x AS (
          SELECT c.bin, c.doc_id, (c.e - c.n_tokens) AS s, c.e, t.total,
                 unnest(generate_series(
                     CAST((c.e - c.n_tokens) // {seq_len} AS BIGINT),
                     CAST((c.e - 1) // {seq_len} AS BIGINT))) AS seq
          FROM c JOIN t ON c.bin = t.bin)
        SELECT CAST(bin AS INT) AS bin, seq AS seq_id, doc_id,
               greatest(s, seq * {seq_len}) - s AS doc_tok_start,
               greatest(s, seq * {seq_len}) - seq * {seq_len} AS seq_tok_start,
               least(e, (seq + 1) * {seq_len}) - greatest(s, seq * {seq_len})
                   AS n_tok,
               (seq = (total - 1) // {seq_len} AND total % {seq_len} <> 0)
                   AS partial
        FROM x
        ORDER BY bin, seq_id, doc_id, doc_tok_start
    """).fetchdf()


def _check_vs_oracle(pdf, seq_len=SEQ, num_bins=4):
    got = _run(pdf, seq_len, num_bins)
    h = stable_hash64(pd.array(pdf.doc_id, dtype="int64").to_numpy(),
                      seed=42)
    exp = duck_oracle(pdf, seq_len, num_bins, h % num_bins)
    exp = exp.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"bin": "int64", "partial": "bool"}),
        exp.astype({"bin": "int64", "partial": "bool"}),
        check_dtype=False)
    return got


def test_pack_matches_duckdb_oracle():
    rng = np.random.default_rng(5)
    texts = [" ".join(f"t{j}" for j in range(rng.integers(0, 60)))
             for _ in range(120)]
    _check_vs_oracle(_docs(texts))


def test_pack_invariants():
    rng = np.random.default_rng(8)
    texts = [" ".join("x" * 1 for _ in range(rng.integers(1, 40)))
             for _ in range(80)]
    pdf = _docs(texts)
    got = _check_vs_oracle(pdf)
    # every doc's tokens fully assigned, in order, exactly once
    ntok = pdf.text.str.split().str.len().fillna(0).astype(int)
    per_doc = got.groupby("doc_id").n_tok.sum()
    for d, nt in ntok.items():
        if nt > 0:
            assert per_doc[d] == nt
    # every sequence holds exactly seq_len tokens unless flagged partial
    seqs = got.groupby(["bin", "seq_id"]).agg(tot=("n_tok", "sum"),
                                              part=("partial", "any"))
    assert ((seqs.tot == SEQ) | seqs.part).all()
    # at most one partial sequence per bin, and it's the last
    for b, grp in got.groupby("bin"):
        p = grp[grp.partial]
        if len(p):
            assert p.seq_id.nunique() == 1
            assert p.seq_id.max() == grp.seq_id.max()
    # in-sequence offsets tile each sequence without overlap
    for (b, s), grp in got.groupby(["bin", "seq_id"]):
        grp = grp.sort_values("seq_tok_start")
        pos = 0
        for _, r in grp.iterrows():
            assert r.seq_tok_start == pos
            pos += r.n_tok


def test_pack_partitioning_invariant():
    texts = [" ".join(f"w{i}_{j}" for j in range(i % 23)) for i in range(90)]
    pdf = _docs(texts)
    a = _run(pdf, num_bins=3)
    b_ds = rd.from_pandas(pdf).repartition(7)
    b = (pack_sequences(b_ds, SEQ, num_bins=3).to_pandas()
         .sort_values(["bin", "seq_id", "doc_id", "doc_tok_start"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_pack_long_doc_spans_sequences():
    pdf = _docs([" ".join(f"a{j}" for j in range(SEQ * 3 + 5))])
    got = _run(pdf, num_bins=1)
    assert len(got) == 4
    assert got.n_tok.sum() == SEQ * 3 + 5
    assert (got.seq_id.to_numpy() == np.arange(4)).all()
    assert got.partial.tolist() == [False, False, False, True]


def test_pack_validation():
    ds = rd.from_pandas(_docs(["a b"]))
    with pytest.raises(ValueError):
        pack_sequences(ds, 0)
    with pytest.raises(ValueError):
        pack_sequences(ds, 4, num_bins=0)


def test_materialize_sequences_exact():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.functions.encode import (
        build_vocab, encode_docs)
    from halvesting_geometric_ray.functions.pack import (
        materialize_sequences, pack_sequences)

    rng = np.random.default_rng(8)
    words = ["w%d" % i for i in range(30)]
    texts = [" ".join(rng.choice(words, rng.integers(1, 25)))
             for _ in range(80)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(80, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string())}))
    _, ref = build_vocab(docs, vocab_size=100)
    enc = encode_docs(docs, ref).materialize()
    L = 16
    manifest = pack_sequences(docs, seq_len=L, num_bins=4)
    out = (materialize_sequences(manifest, enc).to_pandas()
           .sort_values(["bin", "seq_id"]).reset_index(drop=True))

    # oracle: replay the pack per bin in doc_id order from enc ids
    ids_by_doc = {int(r.doc_id): list(r.ids)
                  for r in enc.to_pandas().itertuples()}
    from halvesting_geometric_ray.functions.hashing import stable_hash64
    bins = np.asarray(stable_hash64(
        pa.array(np.arange(80, dtype=np.int64)), seed=42)) % 4
    for b in range(4):
        stream = []
        for d in sorted(np.flatnonzero(bins == b)):
            stream.extend(ids_by_doc[int(d)])
        got_b = out[out.bin == b]
        exp_seqs = [stream[i:i + L] for i in range(0, len(stream), L)]
        assert len(got_b) == len(exp_seqs)
        for row, exp in zip(got_b.itertuples(), exp_seqs):
            assert list(row.ids) == exp
            assert row.n_tok == len(exp)
            assert row.partial == (len(exp) < L)


def test_materialize_sequences_padding():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.functions.encode import (
        build_vocab, encode_docs)
    from halvesting_geometric_ray.functions.pack import (
        materialize_sequences, pack_sequences)

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(5, dtype=np.int64)),
        "text": pa.array(["a b c", "d e", "f", "g h i j", "k"],
                         type=pa.string())}))
    _, ref = build_vocab(docs, vocab_size=20)
    enc = encode_docs(docs, ref).materialize()
    man = pack_sequences(docs, seq_len=4, num_bins=2)
    out = materialize_sequences(man, enc, pad_id=-1, seq_len=4).to_pandas()
    for r in out.itertuples():
        assert len(r.ids) == 4
        ids = list(r.ids)
        assert ids[:r.n_tok].count(-1) == 0
        assert all(x == -1 for x in ids[r.n_tok:])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        materialize_sequences(man, enc, pad_id=-1)


# ---- skip-gram pairs ----------------------------------------------------

def test_skipgram_pairs_matches_duckdb():
    import duckdb
    import pandas as pd
    import ray.data as rd

    from halvesting_geometric_ray.functions.pack import skipgram_pairs

    rng = np.random.default_rng(2)
    n = 600
    pdf = pd.DataFrame({
        "walk": rng.integers(0, 40, n).astype(np.int64),
        "step": rng.permutation(n).astype(np.int64),
        "tok": rng.integers(0, 25, n).astype(np.int64)})
    got = (skipgram_pairs(rd.from_pandas(pdf).repartition(5),
                          "walk", "step", "tok", window=3).to_pandas()
           .sort_values(["walk", "center", "context", "offset"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute("""
        WITH r AS (SELECT walk, tok,
                   row_number() OVER (PARTITION BY walk ORDER BY step)
                       AS rn FROM t)
        SELECT a.walk, a.tok AS center, b.tok AS context,
               (b.rn - a.rn) AS "offset"
        FROM r a JOIN r b ON a.walk = b.walk
        WHERE b.rn - a.rn BETWEEN 1 AND 3
        ORDER BY a.walk, center, context, "offset"
    """).df().reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ["walk", "center", "context", "offset"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_skipgram_no_cross_sequence_and_validation():
    import pandas as pd
    import pytest
    import ray.data as rd

    from halvesting_geometric_ray.functions.pack import skipgram_pairs

    pdf = pd.DataFrame({"w": np.array([0, 0, 1, 1], dtype=np.int64),
                        "s": np.array([0, 1, 0, 1], dtype=np.int64),
                        "t": np.array([10, 11, 20, 21], dtype=np.int64)})
    out = skipgram_pairs(rd.from_pandas(pdf), "w", "s", "t",
                         window=3).to_pandas()
    assert sorted(zip(out.center, out.context)) == [(10, 11), (20, 21)]
    with pytest.raises(ValueError, match="window"):
        skipgram_pairs(rd.from_pandas(pdf), "w", "s", "t", window=0)


def test_skipgram_negatives_distribution_and_determinism():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.functions.pack import skipgram_negatives

    rng = np.random.default_rng(7)
    pairs = pd.DataFrame({
        "center": rng.integers(0, 5, 6000).astype(np.int64),
        "context": np.arange(6000, dtype=np.int64)})  # unique pair ids
    vocab = pa.table({"token": pa.array(np.arange(4, dtype=np.int64)),
                      "n": pa.array(np.array([1, 16, 81, 256],
                                             dtype=np.int64))})
    out = skipgram_negatives(rd.from_pandas(pairs), vocab, k=3,
                             seed=11).to_pandas()
    assert len(out) == 3 * len(pairs)
    # noise law ~ n^0.75 = [1, 8, 27, 64] -> normalized weights
    wts = np.array([1, 8, 27, 64], dtype=np.float64)
    wts /= wts.sum()
    freq = out.neg.value_counts(normalize=True).sort_index().to_numpy()
    assert np.allclose(freq, wts, atol=0.02)
    # partitioning invariance (stateless draws keyed on the pair)
    out8 = skipgram_negatives(rd.from_pandas(pairs).repartition(8),
                              vocab, k=3, seed=11).to_pandas()
    a = out.sort_values(["center", "context", "neg"]).reset_index(drop=True)
    b = out8.sort_values(["center", "context", "neg"]).reset_index(drop=True)
    assert a.equals(b)


def test_skipgram_negatives_validation():
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from halvesting_geometric_ray.functions.pack import skipgram_negatives

    pairs = rd.from_pandas(pd.DataFrame(
        {"center": np.array([0], dtype=np.int64),
         "context": np.array([1], dtype=np.int64)}))
    vocab = pa.table({"token": pa.array(np.array([0], dtype=np.int64)),
                      "n": pa.array(np.array([1], dtype=np.int64))})
    with pytest.raises(ValueError, match="k must"):
        skipgram_negatives(pairs, vocab, k=0)
    empty = pa.table({"token": pa.array([], type=pa.int64()),
                      "n": pa.array([], type=pa.int64())})
    with pytest.raises(ValueError, match="empty"):
        skipgram_negatives(pairs, empty)

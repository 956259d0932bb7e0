"""Vocab build + corpus encode vs exact Python oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.encode import build_vocab, encode_docs


def _docs():
    texts = ["b a a c", "a b  b", "", "d a", "c c b a"]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, type=pa.string())})), texts


def _py_vocab(texts, vocab_size):
    from collections import Counter

    c = Counter(t for s in texts for t in s.split() if t)
    return [t for t, _ in sorted(c.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
            ][:vocab_size]


def test_vocab_ids_deterministic():
    ds, texts = _docs()
    vocab, ref = build_vocab(ds, vocab_size=10)
    vt = vocab.to_pandas()
    # a:5 b:4 c:3 d:1 -> ids by count desc, token asc
    assert list(vt.token) == _py_vocab(texts, 10) == ["a", "b", "c", "d"]
    assert list(vt.token_id) == [0, 1, 2, 3]
    assert list(vt.n) == [5, 4, 3, 1]


def test_encode_matches_oracle_with_unk():
    ds, texts = _docs()
    vocab, ref = build_vocab(ds, vocab_size=2)  # only a, b in vocab
    got = (encode_docs(ds.repartition(3), ref).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    vmap = {"a": 0, "b": 1}
    for i, s in enumerate(texts):
        toks = [t for t in s.split() if t]
        exp = [vmap.get(t, 2) for t in toks]  # unk_id = V = 2
        assert list(got.ids[i]) == exp, (i, s)
        assert got.n_tokens[i] == len(toks)


def test_encode_feeds_packing():
    ds, texts = _docs()
    _, ref = build_vocab(ds, vocab_size=10)
    enc = encode_docs(ds, ref).to_pandas()
    assert enc.n_tokens.sum() == sum(len(s.split()) for s in texts)


def test_vocab_validation():
    ds, _ = _docs()
    with pytest.raises(ValueError):
        build_vocab(ds, vocab_size=0)


def test_decode_roundtrip():
    from halvesting_geometric_ray.functions.encode import decode_docs

    ds, texts = _docs()
    vocab, ref = build_vocab(ds, vocab_size=2)  # a, b in vocab
    enc = encode_docs(ds, ref)
    got = (decode_docs(enc, vocab).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, s in enumerate(texts):
        exp = " ".join(t if t in ("a", "b") else "<unk>"
                       for t in s.split() if t)
        assert got.text[i] == exp, (i, s)

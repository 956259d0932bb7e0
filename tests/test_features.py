"""Feature hashing: determinism, geometry, oracle, invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.features import (
    hash_features, hash_features_batch)
from halvesting_geometric_ray.functions.hashing import stable_hash64

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, type=pa.string())}))


def _py_vector(text, dim, bigrams=True, signed=True):
    toks = [t for t in text.split(" ") if t]
    v = np.zeros(dim)

    def add(h):
        h = np.uint64(h)
        with np.errstate(over="ignore"):
            mixed = (h * _MIX) ^ (h >> np.uint64(29))
        s = -1.0 if signed and (int(mixed) >> 63) & 1 else 1.0
        v[int(mixed % np.uint64(dim))] += s

    hs = [np.uint64(int(stable_hash64([t])[0])) for t in toks]
    for h in hs:
        add(h)
    if bigrams:
        for a, b in zip(hs[:-1], hs[1:]):
            with np.errstate(over="ignore"):
                add(a * np.uint64(1000003) + b)
    n = np.linalg.norm(v)
    return v / (n if n else 1.0)


def test_matches_python_oracle():
    texts = ["alpha beta gamma", "alpha alpha", "delta", "", "x y x y"]
    got = (hash_features(_ds(texts), dim=64).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, text in enumerate(texts):
        exp = _py_vector(text, 64)
        np.testing.assert_allclose(np.array(got.features[i]), exp,
                                   atol=1e-12)


def test_similar_texts_closer_than_dissimilar():
    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox leaps over the lazy dog"
    c = "entirely different words appear in this sentence here now"
    got = (hash_features(_ds([a, b, c]), dim=512).to_pandas()
           .sort_values("doc_id"))
    va, vb, vc = (np.array(x) for x in got.features)
    assert va @ vb > va @ vc + 0.3


def test_partitioning_invariance_and_norm():
    rng = np.random.default_rng(11)
    words = ["w%d" % i for i in range(50)]
    texts = [" ".join(rng.choice(words, rng.integers(2, 30)))
             for _ in range(200)]
    one = (hash_features(_ds(texts).repartition(1), dim=128).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    many = (hash_features(_ds(texts).repartition(9), dim=128).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    for i in range(len(texts)):
        np.testing.assert_array_equal(np.array(one.features[i]),
                                      np.array(many.features[i]))
        assert abs(np.linalg.norm(np.array(one.features[i])) - 1) < 1e-9


def test_validation():
    with pytest.raises(ValueError):
        hash_features(_ds(["a"]), dim=1)

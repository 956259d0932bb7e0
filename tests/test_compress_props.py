"""Property fuzz for the compressed-adjacency codec and WordPiece
greedy encode (hypothesis): round-trip identity over arbitrary
varint values and arbitrary sorted adjacency structures; WordPiece
encode always covers or UNKs, never drops characters."""

import numpy as np
from hypothesis import given, settings, strategies as st

from halvesting_geometric_ray.functions.wordpiece import \
    wordpiece_encode_word
from halvesting_geometric_ray.graph.compress import (
    decode_adjacency, encode_adjacency, varint_decode, varint_encode)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                max_size=50))
def test_varint_roundtrip_prop(vals):
    v = np.asarray(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v)), v)


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_adjacency_roundtrip_prop(data):
    n = data.draw(st.integers(min_value=1, max_value=30))
    vid_lo = data.draw(st.integers(min_value=0, max_value=10**6))
    rows = []
    for _ in range(n):
        nbrs = data.draw(st.lists(
            st.integers(min_value=0, max_value=10**7),
            max_size=8, unique=True))
        rows.append(np.sort(np.asarray(nbrs, dtype=np.int64)))
    indptr = np.zeros(n + 1, dtype=np.int64)
    for i, r in enumerate(rows):
        indptr[i + 1] = indptr[i] + len(r)
    indices = np.concatenate(rows) if indptr[-1] else \
        np.empty(0, dtype=np.int64)
    blob = encode_adjacency(vid_lo, indptr, indices)
    assert np.array_equal(decode_adjacency(vid_lo, indptr, blob),
                          indices)


_UNITS = {"[UNK]", "a", "b", "ab", "##a", "##b", "##ab", "##ba"}


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abc", max_size=12))
def test_wordpiece_encode_total_coverage(word):
    got = wordpiece_encode_word(word, _UNITS)
    if "c" in word or word == "":
        if word == "":
            assert got == []
        else:
            assert got is None  # 'c' not in the alphabet -> [UNK]
    else:
        assert got is not None
        # pieces concatenate back to the word, continuations after
        # the first, each piece in the vocab
        assert got[0] in _UNITS and not got[0].startswith("##")
        assert all(p.startswith("##") for p in got[1:])
        assert "".join(p[2:] if p.startswith("##") else p
                       for p in got) == word

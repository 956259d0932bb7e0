"""chunk_documents: boundaries, overlap, reconstruction invariants."""

import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.chunking import chunk_documents


def _run(texts, **kw):
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    return (chunk_documents(ds, **kw).to_pandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True))


def test_no_overlap_exact_boundaries():
    t = " ".join(f"w{i}" for i in range(10))
    out = _run([t], chunk_tokens=4)
    assert list(out.n_tokens) == [4, 4, 2]
    assert out.text[0] == "w0 w1 w2 w3"
    assert out.text[2] == "w8 w9"
    # reconstruction: concatenation of chunks == original tokens
    assert " ".join(out.text) == t


def test_overlap_windows():
    t = " ".join(f"w{i}" for i in range(8))
    out = _run([t], chunk_tokens=4, overlap=2)
    # stride 2: [0:4], [2:6], [4:8] — last covers the tail exactly
    assert list(out.text) == ["w0 w1 w2 w3", "w2 w3 w4 w5",
                              "w4 w5 w6 w7"]
    # every consecutive pair shares exactly `overlap` tokens
    for a, b in zip(out.text, out.text[1:]):
        assert a.split(" ")[2:] == b.split(" ")[:2]


def test_short_and_empty_docs():
    out = _run(["one two", "", "solo"], chunk_tokens=16)
    assert len(out) == 2  # empty doc emits nothing
    assert set(out.n_tokens) == {2, 1}
    assert (out.chunk_idx == 0).all()


def test_partial_tail_never_dropped_and_validation():
    t = " ".join(str(i) for i in range(7))
    out = _run([t], chunk_tokens=3, overlap=1)
    # stride 2: [0:3],[2:5],[4:7] — 7 tokens all covered
    covered = set()
    for txt in out.text:
        covered |= set(txt.split(" "))
    assert covered == {str(i) for i in range(7)}
    with pytest.raises(ValueError):
        _run([t], chunk_tokens=0)
    with pytest.raises(ValueError):
        _run([t], chunk_tokens=4, overlap=4)


def test_null_text_emits_no_chunks():
    # nulls behave like empty docs (oracle's WHERE text <> '' drops
    # both); previously crashed with AttributeError on NoneType
    out = _run(["a b c", None, "d"], chunk_tokens=2)
    assert list(out.doc_id.unique()) == [0, 2]
    assert list(out[out.doc_id == 0].text) == ["a b", "c"]

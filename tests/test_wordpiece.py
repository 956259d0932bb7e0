"""WordPiece: sequential pure-Python trainer reference, the classic
worked example, layout invariance, greedy-encode semantics, UNK
handling, round-trip through the distributed encoder."""

import collections

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.wordpiece import (
    apply_wordpiece, train_wordpiece, wordpiece_encode_word)


def docs_ds(texts):
    return rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64),
         "text": texts}))


def ref_train(texts, n_merges):
    """Sequential reference: word counts -> per-round likelihood-score
    merges, score = n_ab/(n_a*n_b), ties -> smallest (a, b) under the
    same packed ordering as the engine."""
    CONT, BASE = 1 << 20, 1 << 21
    wc = collections.Counter(
        w for t in texts for w in t.split(" "))
    rows = []
    for w, n in wc.items():
        syms = [ord(c) if i == 0 else ord(c) + CONT
                for i, c in enumerate(w)]
        rows.append((syms, n))
    strings = {}

    def ustr(s):
        if s in strings:
            return strings[s]
        return chr(s) if s < CONT else "##" + chr(s - CONT)

    merges = []
    alphabet = sorted({s for syms, _ in rows for s in syms})
    for r in range(n_merges):
        pc = collections.Counter()
        uc = collections.Counter()
        for syms, n in rows:
            for s in syms:
                uc[s] += n
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        best = None
        for (a, b), nab in pc.items():
            den = uc[a] * uc[b]
            key = (a << 32) | b
            if best is None:
                best = (nab, den, key, a, b)
            else:
                lhs = nab * best[1]
                rhs = best[0] * den
                if lhs > rhs or (lhs == rhs and key < best[2]):
                    best = (nab, den, key, a, b)
        if best is None or best[0] < 2:
            break
        nab, den, key, a, b = best
        new = BASE + r
        sa = ustr(a)
        sb = ustr(b)
        strings[new] = sa + (sb[2:] if sb.startswith("##") else sb)
        merges.append((a, b, new))
        out = []
        for syms, n in rows:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a \
                        and syms[i + 1] == b:
                    res.append(new)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append((res, n))
        rows = out
    vocab = ["[UNK]"] + [ustr(s) for s in alphabet] \
        + [strings[m[2]] for m in merges]
    return vocab


CORPUS = ["hug " * 10 + "pug " * 5 + "pun " * 12,
          "bun " * 4 + "hugs " * 5, "hug pun bun hug"]
CORPUS = [t.strip() for t in CORPUS]


@pytest.mark.parametrize("n_merges", [3, 8])
def test_matches_sequential_reference(n_merges):
    vocab, info = train_wordpiece(docs_ds(CORPUS), n_merges)
    assert vocab == ref_train(CORPUS, n_merges)
    assert info["vocab_size"] == len(vocab)
    # likelihood score, not raw count: the reference's famous property
    # that rare-but-exclusive pairs beat frequent-but-promiscuous ones
    for r in info["rounds"]:
        assert r["count"] >= 2


def test_layout_invariance():
    texts = [f"w{i % 17} common tail{i % 5}" for i in range(200)]
    v1, _ = train_wordpiece(docs_ds(texts), 6, num_parts=1)
    v4, _ = train_wordpiece(docs_ds(texts), 6, num_parts=4)
    assert v1 == v4 == ref_train(texts, 6)


def test_greedy_encode_semantics():
    units = {"[UNK]", "h", "##u", "##g", "##gs", "hug", "##s"}
    assert wordpiece_encode_word("hug", units) == ["hug"]
    assert wordpiece_encode_word("hugs", units) == ["hug", "##s"]
    assert wordpiece_encode_word("hugg", units) == ["hug", "##g"]
    assert wordpiece_encode_word("hx", units) is None  # -> [UNK]
    # longest-match-first: "##gs" wins over "##g" "##s"
    assert wordpiece_encode_word("hugsgs", {"h", "##u", "##gs", "##g",
                                            "##s"}) == \
        ["h", "##u", "##gs", "##gs"]


def test_apply_roundtrip_and_unk():
    vocab, _ = train_wordpiece(docs_ds(CORPUS), 8)
    enc = apply_wordpiece(
        docs_ds(["hug pun zebra!?"]), vocab).to_pandas()
    ids = list(enc.iloc[0]["pieces"])
    units = set(vocab)
    # decode: ids -> units -> concatenated words must reproduce the
    # encodable words; the unencodable word maps to the single UNK id 0
    toks = [vocab[i] for i in ids]
    assert "".join(t[2:] if t.startswith("##") else t
                   for t in toks if t != "[UNK]").startswith("hugpun")
    assert 0 in ids  # zebra!? has chars outside the corpus alphabet
    with pytest.raises(ValueError):
        apply_wordpiece(docs_ds(["x"]), ["h", "##u"])


def test_validation():
    with pytest.raises(ValueError):
        train_wordpiece(docs_ds(["a b"]), 0)

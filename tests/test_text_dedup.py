"""Text/dedup/similarity suite: SQL-checkable entries vs DuckDB; hashed
entries (LSH, simhash, lsh-knn) vs their exact counterparts."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from halvesting_geometric_ray.queries_text import ORACLE, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = ["documents", "embeddings"]

SQL_CHECKED = sorted(ORACLE.keys())


def _duck(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _pdf(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_parity(name):
    got = _norm(_pdf(QUERIES[name](SF)))
    exp = _norm(_duck(ORACLE[name]))
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_minhash_lsh_recall_vs_exact():
    """LSH-verified pairs are a subset of exact >=0.5 pairs, and recall
    on strong near-dups (>=0.8) is total (16 bands x 4 rows: collision
    prob at j=0.8 is 1-(1-0.8^4)^16 ~ 0.9996; the fixture's planted dups
    sit at 0.9-1.0)."""
    exact = _pdf(QUERIES["q_neardup_jaccard"](SF))
    lsh = _pdf(QUERIES["q_minhash_lsh"](SF))
    exact_pairs = set(zip(exact.doc_a, exact.doc_b))
    lsh_pairs = set(zip(lsh.doc_a, lsh.doc_b))
    assert lsh_pairs <= exact_pairs
    strong = set(zip(exact[exact.jaccard_x1000 >= 800].doc_a,
                     exact[exact.jaccard_x1000 >= 800].doc_b))
    assert strong, "fixture should contain planted near-duplicates"
    assert strong <= lsh_pairs


def test_simhash_pairs_capture_planted_dups():
    sh = _pdf(QUERIES["q_simhash_pairs"](SF))
    exact = _pdf(QUERIES["q_neardup_jaccard"](SF))
    strong = set(zip(exact[exact.jaccard_x1000 >= 950].doc_a,
                     exact[exact.jaccard_x1000 >= 950].doc_b))
    got = set(zip(sh.a, sh.b))
    # near-identical docs must collide in simhash space
    assert strong <= got


def test_pii_scrub_planted():
    """Planted emails/phones are redacted identically by the polars
    kernel and the DuckDB oracle regexes."""
    import pyarrow as pa

    from halvesting_geometric_ray.functions.text import (
        EMAIL_RE, PHONE_RE, pii_scrub_batch)

    texts = [
        "contact bob.smith+x@example.co.uk or call +1-555-123-4567 now",
        "no pii here at all",
        "two mails a@b.io c@d.org and digits 123456789 in one row",
        "",
    ]
    b = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    got = pii_scrub_batch(b).to_pandas()
    assert got.clean_text[0] == "contact <EMAIL> or call <PHONE> now"
    assert got.n_emails.tolist() == [1, 0, 2, 0]
    assert got.n_phones.tolist() == [1, 0, 1, 0]

    con = duckdb.connect()
    con.register("t", b.to_pandas())
    exp = con.execute(
        f"SELECT regexp_replace(regexp_replace(text, '{EMAIL_RE}', "
        f"'<EMAIL>', 'g'), '{PHONE_RE}', '<PHONE>', 'g') AS c, "
        f"len(regexp_extract_all(text, '{EMAIL_RE}')) AS ne FROM t").fetchdf()
    assert exp.c.tolist() == got.clean_text.tolist()
    assert exp["ne"].tolist() == got.n_emails.tolist()


def test_batch_hash_kernels_match_perdoc():
    """The vectorized batch MinHash/band/SimHash kernels are bit-identical
    to the per-doc reference implementations (the semantic oracle)."""
    import numpy as np

    from halvesting_geometric_ray.functions import dedup as FD

    rng = np.random.default_rng(3)
    vocab = ["w%d" % i for i in range(30)]
    texts = [""] + [" ".join(rng.choice(vocab, size=n))
                    for n in (1, 2, 3, 7, 50, 200)]
    texts.append(texts[-1])
    sigs = FD.minhash_signatures_batch(texts)
    keys = FD.band_keys_batch(sigs)
    sh = FD.simhash64_batch(texts)
    for i, t in enumerate(texts):
        assert (sigs[i] == FD.minhash_signature(FD.trigram_hashes(t))).all()
        assert keys[i].tolist() == FD.band_keys(sigs[i])
        assert int(sh[i]) == FD.simhash64(t.split(" "))


def test_lsh_hot_bucket_capped(tmp_path, monkeypatch):
    """A planted duplicate cluster far above the bucket cap completes via
    O(n) star candidates, still links every member to the representative,
    and never materializes the O(n^2) pair set."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from halvesting_geometric_ray.config import DEFAULT

    n_dup, n_other = 2000, 50
    rng = np.random.default_rng(9)
    vocab = ["tok%d" % i for i in range(500)]
    dup_text = " ".join(rng.choice(vocab, size=60))
    texts = [dup_text] * n_dup + [" ".join(rng.choice(vocab, size=60))
                                  for _ in range(n_other)]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, str(sf / "documents.parquet"))

    monkeypatch.setattr(DEFAULT, "lsh_bucket_cap", 50)
    lsh = _pdf(QUERIES["q_minhash_lsh"](str(sf)))
    pairs = set(zip(lsh.doc_a, lsh.doc_b))
    # every duplicate links to the representative (doc 0)...
    assert {(0, i) for i in range(1, n_dup)} <= pairs
    # ...and the candidate set stayed O(n), not O(n^2)
    assert len(pairs) < 5 * (n_dup + n_other)

    sh = _pdf(QUERIES["q_simhash_pairs"](str(sf)))
    sh_pairs = set(zip(sh.a, sh.b))
    assert {(0, i) for i in range(1, n_dup)} <= sh_pairs
    assert len(sh_pairs) < 5 * (n_dup + n_other)


def test_knn_lsh_recall():
    exact = _pdf(QUERIES["q_knn_cosine"](SF))
    approx = _pdf(QUERIES["q_knn_cosine_lsh"](SF))
    # rank-1 neighbor recall across the 10 queries >= 50% (4-plane LSH)
    e1 = dict(zip(exact[exact.rnk == 1].query_id,
                  exact[exact.rnk == 1].neighbor_id))
    hits = 0
    for q, grp in approx.groupby("query_id"):
        if e1.get(q) in set(grp.neighbor_id):
            hits += 1
    assert hits >= len(e1) * 0.6


def test_fingerprint_deterministic():
    a = _pdf(QUERIES["q_fingerprint"](SF)).sort_values("doc_id")
    b = _pdf(QUERIES["q_fingerprint"](SF)).sort_values("doc_id")
    assert (a.fingerprint.to_numpy() == b.fingerprint.to_numpy()).all()
    assert a.fingerprint.nunique() > 1


def test_multimodal_resize_and_frames():
    """Plumbing for the resize and frame-sample stages: deterministic
    fake output with the contracted schema/shapes; real mode raises."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pt
    import ray.data as rd

    from halvesting_geometric_ray.functions.multimodal import (
        FrameSampleStage, ResizeStage, frame_sample, resize_binary)

    payloads = [bytes(range(200)), b"xy", b""]
    t = pa.table({"url": pa.array(["a", "b", "c"]),
                  "html": pa.array(payloads, type=pa.binary())})
    ds = rd.from_arrow(t)

    rz = resize_binary(ds, out_w=8, out_h=4).to_pandas().set_index("url")
    assert (rz.out_w == 8).all() and (rz.out_h == 4).all()
    assert all(len(x) == 32 for x in rz.resized)
    rz2 = resize_binary(ds, out_w=8, out_h=4).to_pandas().set_index("url")
    assert (rz.loc["a", "resized"] == rz2.loc["a", "resized"])  # deterministic

    fr = frame_sample(ds, n_frames=4).to_pandas()
    assert len(fr[fr.url == "a"]) == 4
    assert fr[fr.url == "a"].frame_idx.tolist() == [0, 1, 2, 3]
    assert len(fr[fr.url == "b"]) == 2  # payload shorter than n_frames
    assert len(fr[fr.url == "c"]) == 1  # empty payload -> one empty frame

    with _pt.raises(NotImplementedError):
        ResizeStage(mode="real")(t)
    with _pt.raises(NotImplementedError):
        FrameSampleStage(mode="real")(t)


def test_binary_decode_stub():
    out = _pdf(QUERIES["q_binary_decode"](SF))
    assert len(out) > 0
    assert (out.n_bytes > 0).all()
    import pytest as _pt

    from halvesting_geometric_ray.functions.multimodal import DecodeStage

    import pyarrow as pa

    # real mode decodes PNG/BMP/WAV/JPEG (tests/test_png.py /
    # test_jpeg.py); payloads with an unrecognized signature still
    # raise NotImplementedError (those codecs are absent from this
    # container), and a recognized-but-corrupt stream raises
    # ValueError from its decoder
    t = pa.table({"url": pa.array(["a"]),
                  "html": pa.array([b"\x00\x01notacodec"],
                                   type=pa.binary())})
    with _pt.raises(NotImplementedError):
        DecodeStage(mode="real")(t)
    t2 = pa.table({"url": pa.array(["b"]),
                   "html": pa.array([b"\xff\xd8notajpeg"],
                                    type=pa.binary())})
    with _pt.raises(ValueError):
        DecodeStage(mode="real")(t2)


def test_embed_neardup_lsh_recall():
    """LSH pairs are a subset of the exact pairs with decent recall
    (n_planes=3 x 12 tables -> ~0.97 expected at sim=0.4)."""
    exact = _pdf(QUERIES["q_embed_neardup"](SF))
    lsh = _pdf(QUERIES["q_embed_neardup_lsh"](SF))
    e = set(zip(exact.a, exact.b))
    l = set(zip(lsh.a, lsh.b))
    assert l <= e
    assert len(e) > 0
    assert len(l & e) >= 0.8 * len(e)


def test_cosine_pairs_lsh_planted_cluster():
    """Planted near-identical vectors are all recovered, and a planted
    hot bucket (many near-dups) stays within the cap guard."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.functions.similarity import (
        cosine_pairs, cosine_pairs_lsh)

    rng = np.random.default_rng(4)
    base = rng.standard_normal(64)
    dups = base[None, :] + 0.01 * rng.standard_normal((40, 64))
    others = rng.standard_normal((200, 64))
    m = np.concatenate([dups, others], axis=0)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), type=pa.float64()), 64)})
    ds = rd.from_arrow(t)
    got = set(map(tuple, cosine_pairs_lsh(ds, 0.95, n_planes=4, n_tables=12)
                  .to_pandas().to_numpy()))
    exp = set(map(tuple,
                  cosine_pairs(ds, 0.95).to_pandas().to_numpy()))
    # every planted near-dup pair (sim ~0.999) must be recovered
    planted = {(a, b) for a in range(40) for b in range(a + 1, 40)}
    assert planted <= exp
    assert planted <= got
    assert got <= exp


def test_knn_ivf_recall():
    exact = _pdf(QUERIES["q_knn_cosine"](SF))
    approx = _pdf(QUERIES["q_knn_cosine_ivf"](SF))
    e1 = dict(zip(exact[exact.rnk == 1].query_id,
                  exact[exact.rnk == 1].neighbor_id))
    hits = sum(1 for q, grp in approx.groupby("query_id")
               if e1.get(q) in set(grp.neighbor_id))
    assert hits >= len(e1) * 0.5  # nprobe=4 of 16 lists on near-random data


def test_trigram_hash_batch_matches_perdoc_sets():
    """The vectorized batch trigram hasher must induce the SAME per-doc
    gram-set structure as the per-doc string-gram path: identical
    per-doc distinct counts and identical pairwise intersection sizes
    (different concrete hash values are fine — only set semantics feed
    the Jaccard pipeline)."""
    import pyarrow as pa

    from halvesting_geometric_ray.functions import dedup as FD

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(words, size=rng.integers(3, 40)))
             for _ in range(50)]
    texts += ["a b", "", "a b c", "a b c"]  # short/empty/dup edge cases
    ids = np.arange(len(texts), dtype=np.int64)

    did, keys = FD.trigram_hash_batch(ids, pa.array(texts))
    got = {}
    for d, k in zip(did, keys):
        got.setdefault(int(d), set()).add(int(k))
    exp = {}
    for d, t in zip(ids, texts):
        exp[int(d)] = set(FD.trigrams(t.split(" ")))
    for d in exp:
        assert len(got.get(d, set())) == len(exp[d]), d
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            gi, gj = got.get(i, set()), got.get(j, set())
            assert len(gi & gj) == len(exp[i] & exp[j]), (i, j)


def test_cosine_pairs_chunked_equals_single_chunk():
    """Blocked chunk-pair tasks must produce the exact same pair set for
    any chunk_rows (the r3 rewrite of the driver-matrix variant)."""
    from halvesting_geometric_ray.functions.similarity import cosine_pairs

    rng = np.random.default_rng(7)
    n, dim = 300, 16
    m = rng.normal(size=(n, dim))
    m[50] = m[10]  # planted duplicates
    m[51] = m[10] + 1e-9
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), type=pa.float64()), dim)})
    ds = rd.from_arrow(t).repartition(6)

    def pairs(chunk_rows):
        df = cosine_pairs(ds, 0.7, chunk_rows=chunk_rows).to_pandas()
        return set(zip(df.a, df.b))

    big = pairs(10_000)   # single chunk
    small = pairs(64)     # many chunk-pair tasks
    assert big == small
    assert (10, 50) in big and (10, 51) in big


def test_cosine_pairs_duplicated_vec_id_no_self_pairs():
    """Rows sharing a vec_id (e.g. a re-ingested document) must not
    surface as self-pairs (a == b) — regression for the r3 chunked
    rewrite which dropped v1's a<b guard."""
    from halvesting_geometric_ray.functions.similarity import cosine_pairs

    rng = np.random.default_rng(3)
    ids = np.arange(20, dtype=np.int64)
    ids[7] = 3  # duplicate id
    m = rng.normal(size=(20, 8))
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.FixedSizeListArray.from_arrays(
                      pa.array(m.ravel(), type=pa.float64()), 8)})
    for chunk_rows in (6, 100):  # same-chunk and cross-chunk duplicates
        df = cosine_pairs(rd.from_arrow(t), -1.0,
                          chunk_rows=chunk_rows).to_pandas()
        assert not (df.a == df.b).any()
        assert set(zip(df.a, df.b)) == {
            (int(min(ids[x], ids[y])), int(max(ids[x], ids[y])))
            for x in range(20) for y in range(x + 1, 20)
            if ids[x] != ids[y]}


# ---------------- C4-style line dedup ----------------

def _boiler_corpus(n=200, seed=3):
    """Docs with heavy shared boilerplate: a global header/footer on
    most docs, per-group shared paragraphs, unique middles, in-doc
    repeats, blank lines, and some all-boilerplate / empty docs."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        lines = []
        if i % 7 != 3:
            lines.append("SITE NAVIGATION home about contact")
        lines.append(f"unique middle {i} " + " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta"], 5)))
        if i % 2 == 0:
            lines.append(f"group banner {i % 5}")
        if i % 4 == 0:
            lines.append(lines[-1])  # in-doc repeat
        lines.append("")  # blank
        if i % 6 != 1:
            lines.append("copyright 2026 example inc")
        if i % 31 == 0:
            lines = ["SITE NAVIGATION home about contact"]  # all-boiler
        if i % 53 == 0:
            lines = [""]  # effectively empty
        rows.append({"doc_id": i, "text": "\n".join(lines)})
    return pd.DataFrame(rows)


def test_line_dedup_matches_duckdb_oracle():
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.ops.dedup import line_dedup

    df = _boiler_corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
           .repartition(9)  # lines of one doc stay in one row/batch
    got = (line_dedup(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute("""
WITH exploded AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM documents),
nonempty AS (SELECT * FROM exploded WHERE trim(line) <> ''),
firsts AS (SELECT doc_id, line, min(pos) AS pos
           FROM nonempty GROUP BY doc_id, line),
winners AS (SELECT line, min(doc_id) AS win FROM firsts GROUP BY line),
kept AS (SELECT f.doc_id, f.line, f.pos FROM firsts f
         JOIN winners w ON f.line = w.line AND f.doc_id = w.win)
SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup
FROM kept GROUP BY doc_id ORDER BY doc_id""").df()
    assert len(got) == len(exp)
    assert (got.doc_id.to_numpy() == exp.doc_id.to_numpy()).all()
    assert (got.text_dedup.to_numpy() == exp.text_dedup.to_numpy()).all()
    # boilerplate actually collapsed: the nav line survives exactly once
    joined = "\n".join(got.text_dedup)
    assert joined.count("SITE NAVIGATION") == 1
    assert joined.count("copyright 2026") == 1


def test_line_dedup_partitioning_invariant():
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.ops.dedup import line_dedup

    df = _boiler_corpus(n=120, seed=11)
    t = pa.Table.from_pandas(df, preserve_index=False)
    outs = []
    for nb in (1, 4, 13):
        ds = rd.from_arrow(t).repartition(nb)
        outs.append(line_dedup(ds).to_pandas()
                    .sort_values("doc_id").reset_index(drop=True))
    for o in outs[1:]:
        assert (o.doc_id.to_numpy() == outs[0].doc_id.to_numpy()).all()
        assert (o.text_dedup.to_numpy() == outs[0].text_dedup.to_numpy()).all()


def _hosted_boiler_corpus(n=60, seed=3):
    """Multi-host corpus: per-host nav/footer templates (boilerplate
    within the host), a line shared ACROSS hosts but unique within each
    (must survive group scoping), in-doc repeats, blanks, empty docs."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        host = f"host{i % 4}"
        lines = [f"NAV {host} home about"]
        lines.append(f"unique middle {i} " + " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta"], 5)))
        if i in (0, 5, 10, 15):
            # exactly once per host -> below min_docs=2 within a group,
            # even though it exists on all 4 hosts
            lines.append("cross host rare line")
        if i % 3 == 0:
            lines.append(lines[1])  # in-doc repeat of a unique line
        lines.append("")
        if i % 5 != 2:
            lines.append(f"copyright {host}")
        if i % 17 == 9:
            lines = [f"NAV {host} home about"]  # all-boilerplate doc
        rows.append({"doc_id": i, "source": host, "text": "\n".join(lines)})
    return pd.DataFrame(rows)


_BOILER_ORACLE = """
WITH exploded AS (
  SELECT doc_id, source, unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM documents),
nonempty AS (SELECT * FROM exploded WHERE trim(line) <> ''),
freq AS (SELECT source, line, count(DISTINCT doc_id) AS ndocs
         FROM nonempty GROUP BY source, line),
kept AS (SELECT n.doc_id, n.line, n.pos FROM nonempty n JOIN freq f
         ON n.source = f.source AND n.line = f.line WHERE f.ndocs < 2)
SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean
FROM kept GROUP BY doc_id ORDER BY doc_id"""


def _run_boiler(df, **kw):
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.ops.dedup import boilerplate_strip

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
           .repartition(7)
    return (boilerplate_strip(ds, group_col="source", min_docs=2, **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_boilerplate_strip_matches_duckdb_oracle():
    import duckdb

    df = _hosted_boiler_corpus()
    got = _run_boiler(df)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(_BOILER_ORACLE).df()
    assert len(got) == len(exp)
    assert (got.doc_id.to_numpy() == exp.doc_id.to_numpy()).all()
    assert (got.text_clean.to_numpy() == exp.text_clean.to_numpy()).all()
    joined = "\n".join(got.text_clean)
    # per-host templates are gone EVERYWHERE (unlike line_dedup's
    # keep-one-winner), the cross-host-rare line survives in full
    assert "NAV host0" not in joined and "copyright host1" not in joined
    assert joined.count("cross host rare line") == 4


def test_boilerplate_strip_bucketed_anti_parity():
    """broadcast_cap=0 forces the bucketed hash-join anti path; output
    must match the broadcast path exactly."""
    df = _hosted_boiler_corpus(n=40, seed=9)
    a = _run_boiler(df)
    b = _run_boiler(df, broadcast_cap=0)
    assert (a.doc_id.to_numpy() == b.doc_id.to_numpy()).all()
    assert (a.text_clean.to_numpy() == b.text_clean.to_numpy()).all()


def test_boilerplate_strip_partitioning_invariant():
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.ops.dedup import boilerplate_strip

    df = _hosted_boiler_corpus(n=80, seed=21)
    t = pa.Table.from_pandas(df, preserve_index=False)
    outs = []
    for nb, parts in ((1, 16), (11, 5)):
        ds = rd.from_arrow(t).repartition(nb)
        outs.append(boilerplate_strip(ds, group_col="source",
                                      min_docs=2, num_parts=parts)
                    .to_pandas().sort_values("doc_id")
                    .reset_index(drop=True))
    assert (outs[0].doc_id.to_numpy() == outs[1].doc_id.to_numpy()).all()
    assert (outs[0].text_clean.to_numpy()
            == outs[1].text_clean.to_numpy()).all()


def test_containment_directional():
    """A short doc quoted inside a long one: containment(short in
    long) = 1.0 while Jaccard stays below the near-dup bar; the long
    side is NOT flagged as contained."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from halvesting_geometric_ray.queries_text import (
        containment_pairs, neardup_jaccard_pairs)

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(60))
    long = filler + " " + short + " " + " ".join(
        f"v{i}" for i in range(40))
    other = " ".join(f"x{i}" for i in range(30))
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([1, 2, 3], dtype=np.int64),
         "text": [short, long, other]}))
    got = containment_pairs(ds).to_pandas()
    rows = {(r.doc_a, r.doc_b): r.containment_x1000
            for r in got.itertuples()}
    assert rows == {(1, 2): 1000}  # short fully contained; no reverse
    jac = neardup_jaccard_pairs(ds).to_pandas()
    assert len(jac) == 0  # symmetric screen misses the inclusion
    # threshold validation
    import pytest

    with pytest.raises(ValueError):
        containment_pairs(ds, t_num=3, t_den=2)

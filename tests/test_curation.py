"""End-to-end corpus curation pipeline over a crafted corpus."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.pipelines.curation import curate_corpus


def _corpus():
    w = ["tok%d" % i for i in range(40)]
    base = " ".join(w[:25])                      # 25 distinct tokens
    near = " ".join(w[:24] + ["other"])          # near-dup of base
    other = " ".join(w[10:40])                   # 30 distinct tokens
    pii = ("reach me at bob@example.com today "
           + " ".join("extra%d" % i for i in range(22)))
    texts = [
        base,                                    # 0 keep (representative)
        base,                                    # 1 exact dup of 0
        near,                                    # 2 near-dup of 0
        "too short",                             # 3 quality-dropped
        other,                                   # 4 keep
        pii,                                     # 5 keep, email scrubbed
        other.upper(),                           # 6 normalize -> dup of 4
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, type=pa.string())}))


def test_curate_end_to_end(tmp_path):
    out, info = curate_corpus(
        _corpus(), neardup=True, workdir=str(tmp_path),
        collect_stats=True)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert sorted(df.doc_id) == [0, 4, 5]
    assert "<EMAIL>" in df[df.doc_id == 5].text.iloc[0]
    assert "bob@example.com" not in df[df.doc_id == 5].text.iloc[0]
    c = info["counts"]
    assert c["normalize"] == 7
    assert c["filter"] == 6          # drops the short doc
    assert c["exact_dedup"] == 4     # drops exact dup + case dup
    assert c["neardup_dedup"] == 3   # drops the near-dup


def test_curate_write_roundtrip(tmp_path):
    from halvesting_geometric_ray.sources.readers import (
        read_partitioned_parquet)

    out_dir = str(tmp_path / "curated")
    out, info = curate_corpus(_corpus(), neardup=False,
                              out_path=out_dir)
    back = read_partitioned_parquet(out_dir)
    assert back.count() == out.count() == 4
    assert info["out_path"] == out_dir


def test_exact_dedup_paths_agree(tmp_path):
    """driver_hash_cap=0 forces the distributed combiner exchange for
    exact dedup; the default driver lexsort fast path must keep the
    identical winner-by-min-id survivors."""
    fast, _ = curate_corpus(_corpus(), neardup=False)
    slow, _ = curate_corpus(_corpus(), neardup=False,
                            driver_hash_cap=0)
    df_f = fast.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df_s = slow.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df_f.equals(df_s)
    assert sorted(df_f.doc_id) == [0, 2, 4, 5]


def test_curate_validation():
    with pytest.raises(ValueError):
        curate_corpus(_corpus(), neardup=True, workdir=None)


def test_subset_dup_losers_oracle():
    import pandas as pd

    from halvesting_geometric_ray.ops.dedup import subset_dup_losers

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "h": rng.integers(0, 50, 800).astype(np.int64),
        "id": rng.permutation(800).astype(np.int64)})
    got = sorted(subset_dup_losers(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(7),
        "h", "id").to_pandas().id)
    exp = sorted(pdf[pdf.id != pdf.groupby("h").id.transform("min")].id)
    assert got == exp


def test_curate_cc_fallback_path(tmp_path):
    # pair_cap=0 forces the shard-actor CC path; same survivors
    out, info = curate_corpus(
        _corpus(), neardup=True, workdir=str(tmp_path), pair_cap=0,
        collect_stats=True)
    df = out.to_pandas()
    assert sorted(df.doc_id) == [0, 4, 5]
    assert info["counts"]["neardup_dedup"] == 3


def test_keep_min_by_oracle():
    import pandas as pd

    from halvesting_geometric_ray.ops.dedup import keep_min_by

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({
        "h": rng.integers(0, 40, 600).astype(np.int64),
        "id": rng.permutation(600).astype(np.int64),
        "payload": rng.integers(0, 10**6, 600).astype(np.int64)})
    got = (keep_min_by(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(6),
        "h", "id").to_pandas().sort_values("id").reset_index(drop=True))
    exp = (pdf[pdf.id == pdf.groupby("h").id.transform("min")]
           .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["h", "id", "payload"]], exp[["h", "id", "payload"]],
        check_dtype=False)

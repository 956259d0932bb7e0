"""Round-trip tests for the source/sink wrappers (S1-S5, K1-K4) and
regression tests for checkpoint/CSR-shard lineage hygiene:

- write_parquet forwards compression correctly (Ray 2.49 collects extra
  kwargs via **arrow_parquet_args — passing a dict named arrow_parquet_args
  used to TypeError);
- IterativeCheckpoint wipes stale iter_* part files when the lineage
  changes (filesystem-based have_parts must never adopt foreign state);
- build_csr_shards rebuilds when the recorded lineage stamp differs
  (the CC-with-self-loops vs LP-without collision).
"""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from halvesting_geometric_ray.sources.readers import (
    read_csv, read_jsonl, read_parquet, write_jsonl, write_parquet)
from halvesting_geometric_ray.state.checkpoint import IterativeCheckpoint


def test_parquet_roundtrip(tmp_path):
    df = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    out = str(tmp_path / "t")
    write_parquet(rd.from_pandas(df), out, compression="zstd")
    back = read_parquet(out, columns=["k", "v"]).to_pandas().sort_values("k")
    pd.testing.assert_frame_equal(back.reset_index(drop=True), df)
    # the codec actually took effect
    f = [x for x in os.listdir(out) if x.endswith(".parquet")][0]
    assert pq.ParquetFile(os.path.join(out, f)).metadata.row_group(0) \
        .column(0).compression.lower() == "zstd"


def test_jsonl_roundtrip(tmp_path):
    df = pd.DataFrame({"k": [1, 2], "tags": [["x"], ["y", "z"]]})
    out = str(tmp_path / "j")
    write_jsonl(rd.from_pandas(df), out)
    back = read_jsonl(out).to_pandas().sort_values("k").reset_index(drop=True)
    assert back["k"].tolist() == [1, 2]
    assert [list(t) for t in back["tags"]] == [["x"], ["y", "z"]]


def test_read_csv(tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    back = read_csv(str(p)).to_pandas().sort_values("a")
    assert back["b"].tolist() == ["x", "y"]


def test_single_tsv_sink_roundtrip(tmp_path):
    from halvesting_geometric_ray.sources.readers import write_single_tsv

    df = pd.DataFrame({"a": [3, 1, 2], "b": ["x", "y", "z"]})
    out = str(tmp_path / "t.tsv")
    n = write_single_tsv(rd.from_pandas(df).repartition(3), out)
    assert n == 3
    back = pd.read_csv(out, sep="\t").sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df.sort_values("a").reset_index(drop=True))

    gz = str(tmp_path / "t.tsv.gz")
    write_single_tsv(rd.from_pandas(df), gz, compression="gzip")
    back = pd.read_csv(gz, sep="\t", compression="gzip")
    assert len(back) == 3


def test_config_file_reader(tmp_path):
    from halvesting_geometric_ray.config import boolify, config_from_file

    y = tmp_path / "c.yaml"
    y.write_text("num_parts: 8\ndamping: 0.9\n")
    cfg = config_from_file(str(y))
    assert cfg.num_parts == 8 and cfg.damping == 0.9
    # explicit kwargs beat file values
    assert config_from_file(str(y), num_parts=4).num_parts == 4

    j = tmp_path / "c.json"
    j.write_text('{"pagerank_tol": 1e-8}')
    assert config_from_file(str(j)).pagerank_tol == 1e-8

    bad = tmp_path / "bad.yaml"
    bad.write_text("nmu_parts: 8\n")
    with pytest.raises(ValueError, match="nmu_parts"):
        config_from_file(str(bad))
    with pytest.raises(ValueError, match="extension"):
        from halvesting_geometric_ray.config import load_config_file
        load_config_file(str(tmp_path / "c.toml"))

    assert boolify("Yes") and boolify(1) and not boolify("no")


def test_checkpoint_lineage_wipes_stale_parts(tmp_path):
    root = str(tmp_path)
    ck = IterativeCheckpoint(root, "job", {"n": 10})
    t = pa.table({"vid": pa.array([0, 1], type=pa.int64())})
    IterativeCheckpoint.write_part(t, ck.part_path(3, 0))
    ck.commit_iter(3, {"iter": 3}, [0])
    assert ck.have_parts(3) == {0}

    # same lineage -> resumable
    ck2 = IterativeCheckpoint(root, "job", {"n": 10})
    assert ck2.have_parts(3) == {0}
    assert ck2.latest_complete() == 3

    # changed lineage -> stale part files must vanish, not be adopted
    ck3 = IterativeCheckpoint(root, "job", {"n": 99})
    assert ck3.have_parts(3) == set()
    assert ck3.latest_complete() is None


def test_csr_lineage_stamp_forces_rebuild(tmp_path):
    from halvesting_geometric_ray.graph.csr import build_csr_shards

    edges = rd.from_pandas(pd.DataFrame(
        {"src": [0, 1, 2, 2], "dst": [1, 2, 0, 2]}))
    offsets = np.array([0, 2, 3], dtype=np.int64)
    d = str(tmp_path / "csr")
    build_csr_shards(edges, offsets, d, lineage={"kind": "sym"})
    done = os.path.join(d, "_SHARDS_DONE")
    stamp0 = json.load(open(done))
    mtime0 = os.path.getmtime(os.path.join(d, "shard-00000.parquet"))

    # same lineage: cached (shard files untouched)
    build_csr_shards(edges, offsets, d, lineage={"kind": "sym"})
    assert os.path.getmtime(os.path.join(d, "shard-00000.parquet")) == mtime0

    # different lineage: rebuilt (self-loop-free edge set this time)
    import pyarrow.compute as pc

    simple = edges.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["src"], b["dst"]))),
        batch_format="pyarrow")
    build_csr_shards(simple, offsets, d, lineage={"kind": "sym_noselfloop"})
    stamp1 = json.load(open(done))
    assert stamp0 != stamp1
    t = pq.read_table(os.path.join(d, "shard-00001.parquet"))
    # vertex 2's self-loop is gone from its shard
    assert 2 not in np.asarray(t.column("indices")[0].values).tolist()


def test_partitioned_parquet_roundtrip(tmp_path):
    import os

    import pandas as pd
    import ray.data as rd

    from halvesting_geometric_ray.sources.readers import (
        read_partitioned_parquet, write_partitioned_parquet)

    df = pd.DataFrame({"lang": ["en", "de", "en", "fr"],
                       "doc_id": [1, 2, 3, 4],
                       "x": [1.0, 2.0, 3.0, 4.0]})
    out = str(tmp_path / "psink")
    write_partitioned_parquet(rd.from_pandas(df), out, ["lang"])
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert dirs == ["lang=de", "lang=en", "lang=fr"]
    back = (read_partitioned_parquet(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert back.doc_id.tolist() == [1, 2, 3, 4]
    assert set(back.columns) == {"lang", "doc_id", "x"}
    # partition pruning path: read one partition dir directly
    en = read_partitioned_parquet(os.path.join(out, "lang=en")).to_pandas()
    assert sorted(en.doc_id) == [1, 3]


def test_compact_parquet_coalesces_small_files(tmp_path):
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.sources.readers import compact_parquet

    src = str(tmp_path / "many")
    pdf = pd.DataFrame({"k": np.arange(5000, dtype=np.int64),
                        "v": np.arange(5000, dtype=np.float64)})
    # write deliberately fragmented (many tiny files)
    rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(40) \
        .write_parquet(src)
    assert sum(1 for n in os.listdir(src) if n.endswith(".parquet")) >= 30

    out = str(tmp_path / "compact")
    info = compact_parquet(src, out, target_mb=128)
    assert info["files_in"] >= 30
    assert info["files_out"] <= 2
    back = rd.read_parquet(out).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(back, pdf)


def test_compact_parquet_validation(tmp_path):
    import pytest as _pytest

    from halvesting_geometric_ray.sources.readers import compact_parquet

    with _pytest.raises(ValueError):
        compact_parquet(str(tmp_path / "nope"), str(tmp_path / "out"))


def test_resumable_partitioned_write(tmp_path):
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.sources.readers import (
        read_partitioned_parquet, resumable_partitioned_write)

    out = str(tmp_path / "sink")
    t = pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "lang": pa.array([["en", "fr", "de"][i % 3] for i in range(60)]),
    })
    ds = rd.from_arrow(t)
    r1 = resumable_partitioned_write(ds, out, "lang")
    assert r1 == {"written": ["de", "en", "fr"], "skipped": []}
    assert read_partitioned_parquet(out).count() == 60

    # simulate a mid-job crash: one partition lost its commit marker
    os.remove(os.path.join(out, "lang=fr", "_SUCCESS"))
    for f in os.listdir(os.path.join(out, "lang=fr")):
        os.remove(os.path.join(out, "lang=fr", f))
    stamp = {d: os.listdir(os.path.join(out, d))
             for d in ("lang=en", "lang=de")}
    r2 = resumable_partitioned_write(ds, out, "lang")
    assert r2 == {"written": ["fr"], "skipped": ["de", "en"]}
    # finished partitions untouched, crashed one rebuilt
    assert {d: os.listdir(os.path.join(out, d))
            for d in ("lang=en", "lang=de")} == stamp
    back = read_partitioned_parquet(out).to_pandas()
    assert len(back) == 60 and (back.lang == "fr").sum() == 20
    # fully-committed rerun is a no-op
    assert resumable_partitioned_write(ds, out, "lang")["written"] == []

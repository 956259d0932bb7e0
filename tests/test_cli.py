"""CLI subcommand coverage: profile, encode, pack, curate (in-process
— cli._session() adopts the pytest session's Ray)."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from halvesting_geometric_ray.cli import main


def _docs_parquet(tmp_path, n=60, seed=3):
    rng = np.random.default_rng(seed)
    words = ["tok%d" % i for i in range(40)]
    texts = [" ".join(rng.choice(words, 25, replace=False))
             for _ in range(n)]
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "text": texts})
    p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(pdf), p)
    return p, pdf


def test_cli_profile(tmp_path, capsys):
    p, pdf = _docs_parquet(tmp_path)
    assert main(["profile", "--table", p, "--cols", "doc_id"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_rows"] == len(pdf)
    assert out["doc_id__min"] == 0 and out["doc_id__max"] == len(pdf) - 1


def test_cli_encode_pack_roundtrip(tmp_path, capsys):
    p, pdf = _docs_parquet(tmp_path)
    enc_dir = str(tmp_path / "enc")
    assert main(["encode", "--docs", p, "--out", enc_dir,
                 "--vocab-size", "50"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["vocab_size"] == 40  # full vocab fits
    ids = rd.read_parquet(os.path.join(enc_dir, "ids")).to_pandas()
    assert ids.n_tokens.sum() == 25 * len(pdf)

    pack_dir = str(tmp_path / "packed")
    assert main(["pack", "--docs", p, "--enc", enc_dir, "--out",
                 pack_dir, "--seq-len", "64", "--pad-id", "0"]) == 0
    seqs = rd.read_parquet(os.path.join(pack_dir, "sequences")).to_pandas()
    assert (seqs.ids.apply(len) == 64).all()
    assert seqs.n_tok.sum() == 25 * len(pdf)


def test_cli_curate(tmp_path, capsys):
    p, pdf = _docs_parquet(tmp_path)
    out_dir = str(tmp_path / "curated")
    assert main(["curate", "--docs", p, "--out", out_dir,
                 "--workdir", str(tmp_path / "wd"), "--stats"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["counts"]["normalize"] == len(pdf)
    assert info["counts"]["exact_dedup"] == len(pdf)  # all distinct
    assert os.path.isdir(out_dir)


def test_cli_scc(tmp_path, capsys, tiny_pages_dir):
    wd = str(tmp_path / "wd")
    assert main(["build", "--pages", tiny_pages_dir, "--workdir", wd]) == 0
    capsys.readouterr()
    assert main(["scc", "--workdir", wd]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["scc"]["n_sccs"] >= 1
    labels = rd.read_parquet(os.path.join(wd, "scc")).to_pandas()
    levels = rd.read_parquet(os.path.join(wd, "scc_levels")).to_pandas()
    assert labels.vid.is_unique and levels.vid.is_unique
    # canonical invariant: every scc label is the max vid of its group
    gmax = labels.groupby("scc").vid.max()
    assert (gmax.index == gmax.values).all()
    assert out["scc"]["dag_depth"] >= 0


def test_cli_semdedup(tmp_path, capsys):
    rng = np.random.default_rng(6)
    base = rng.normal(0, 1, (30, 8))
    x = np.concatenate([base, base[:10]])
    ids = np.concatenate([np.arange(30), np.arange(100, 110)])
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(x.ravel(), type=pa.float64()), 8)
    p = str(tmp_path / "emb.parquet")
    pq.write_table(pa.table({"vec_id": pa.array(ids.astype(np.int64)),
                             "embedding": arr}), p)
    out_dir = str(tmp_path / "sd")
    assert main(["semdedup", "--embeddings", p, "--out", out_dir,
                 "--k", "4", "--threshold", "0.999999"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res == {"rows": 40, "survivors": 30, "dropped": 10}
    back = rd.read_parquet(out_dir).to_pandas().set_index("vec_id").keeper
    for i in range(10):
        assert back[100 + i] == i


def test_cli_graph_family(tmp_path, capsys, tiny_pages_dir):
    """One in-process pass over the new graph subcommands sharing a
    built workdir."""
    wd = str(tmp_path / "wd2")
    assert main(["build", "--pages", tiny_pages_dir, "--workdir", wd]) == 0
    capsys.readouterr()
    outs = {}
    for cmd in (["coreness"], ["ktruss", "--k", "3"], ["mis"],
                ["coloring"], ["densest"], ["sssp", "--sources", "0,1"]):
        assert main(cmd + ["--workdir", wd]) == 0, cmd
        outs[cmd[0]] = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])[cmd[0]]
    assert outs["coreness"]["num_iters"] >= 1
    assert outs["ktruss"]["n_edges"] >= 0
    assert outs["mis"]["mis_size"] > 0
    assert outs["coloring"]["n_colors"] >= 1
    assert outs["densest"]["subgraph_size"] > 0
    assert outs["sssp"]["reached"] >= 2
    for layer in ("coreness", "truss_k3", "mis", "coloring", "densest",
                  "sssp"):
        assert rd.read_parquet(os.path.join(wd, layer)).count() > 0


def test_cli_embed(tmp_path, capsys, tiny_pages_dir):
    """`embed`: the reference's end product (learned node embeddings)
    as one command — walks -> pairs -> SGNS -> embeddings parquet."""
    wd = str(tmp_path / "wd_embed")
    assert main(["build", "--pages", tiny_pages_dir,
                 "--workdir", wd]) == 0
    capsys.readouterr()
    assert main(["embed", "--workdir", wd, "--dim", "8",
                 "--epochs", "2", "--negatives", "2"]) == 0
    out = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["embed"]
    assert out["dim"] == 8 and out["n_pairs"] > 0
    assert len(out["epochs"]) == 2 and out["epochs"][0] > 0
    emb = rd.read_parquet(os.path.join(wd, "embeddings")).to_pandas()
    assert len(emb) == out["vocab"]
    assert len(emb.iloc[0]["embedding"]) == 8


def test_cli_linkpred(tmp_path, capsys, tiny_pages_dir):
    """`linkpred`: the reference's evaluation entry point — split,
    train on the train graph, report ROC-AUC over held-out pairs."""
    wd = str(tmp_path / "wd_lp")
    assert main(["build", "--pages", tiny_pages_dir,
                 "--workdir", wd]) == 0
    capsys.readouterr()
    assert main(["linkpred", "--workdir", wd, "--dim", "8",
                 "--epochs", "2", "--negatives", "2",
                 "--test-frac", "0.3"]) == 0
    out = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["linkpred"]
    assert 0.0 <= out["auc"] <= 1.0
    assert out["n_test"] > 0 and out["n_neg"] > 0
    sc = rd.read_parquet(os.path.join(wd, "linkpred_scores")).to_pandas()
    assert len(sc) == out["n_test"] + out["n_neg"]
    assert set(sc.lab.unique()) == {0, 1}


def test_cli_propagate(tmp_path, capsys, tiny_pages_dir):
    """`propagate`: page features smoothed over the link graph."""
    wd = str(tmp_path / "wd_prop")
    assert main(["build", "--pages", tiny_pages_dir,
                 "--workdir", wd]) == 0
    capsys.readouterr()
    assert main(["propagate", "--workdir", wd, "--rounds", "2",
                 "--agg", "mean"]) == 0
    out = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["propagate"]
    assert out == {"rounds": 2, "agg": "mean", "dim": 2, "alpha": 0.15}
    prop = rd.read_parquet(os.path.join(wd, "propagated")).to_pandas()
    assert len(prop) > 0 and len(prop.iloc[0]["f"]) == 2


def test_cli_salsa_simrank(tmp_path, capsys, tiny_pages_dir):
    wd = str(tmp_path / "wd_ss")
    assert main(["build", "--pages", tiny_pages_dir, "--workdir", wd]) == 0
    capsys.readouterr()
    assert main(["salsa", "--workdir", wd]) == 0
    o = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["salsa"]
    assert o["total_authority"] > 0 and o["total_hub"] > 0
    sal = rd.read_parquet(os.path.join(wd, "salsa_scores")).to_pandas()
    assert abs(sal["authority"].sum() - 1.0) < 1e-9
    assert abs(sal["hub"].sum() - 1.0) < 1e-9
    assert main(["simrank", "--workdir", wd, "--top-k", "8",
                 "--walks-per-seed", "16"]) == 0
    o = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["simrank"]
    assert o["n_seeds"] == 8
    import pandas as pd

    sim = pd.read_parquet(os.path.join(wd, "simrank.parquet"))
    assert (sim[sim.a == sim.b].simrank == 1.0).all()


def test_cli_index_search(tmp_path, capsys):
    p, _ = _docs_parquet(tmp_path)
    idx = str(tmp_path / "idx")
    assert main(["index", "--docs", p, "--out", idx,
                 "--num-buckets", "8"]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["index"]
    assert meta["n_docs"] == 60
    assert main(["search", "--index", idx, "--query", "tok1 tok2",
                 "--k", "3"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["search"]
    assert len(res["buckets_read"]) <= 2
    assert len(res["hits"]) == 3
    assert res["hits"][0]["score"] >= res["hits"][-1]["score"]


def test_cli_partition(tmp_path, capsys, tiny_pages_dir):
    """`partition`: LDG blocks + cut report; --relabel writes the
    block-major layers whose offsets are the block boundaries."""
    wd = str(tmp_path / "wd_part")
    assert main(["build", "--pages", tiny_pages_dir,
                 "--workdir", wd]) == 0
    capsys.readouterr()
    assert main(["partition", "--workdir", wd, "--k", "4",
                 "--chunk", "64", "--relabel"]) == 0
    out = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["partition"]
    assert out["k"] == 4
    assert max(out["sizes"]) <= out["cap"]
    assert 0.0 <= out["cut_fraction"] <= 1.0
    blocks = rd.read_parquet(os.path.join(wd, "blocks")).to_pandas()
    assert sorted(blocks.columns) == ["block", "vid"]
    assert blocks.vid.nunique() == len(blocks)
    v2 = rd.read_parquet(os.path.join(wd, "vertices_bm")).to_pandas()
    e2 = rd.read_parquet(os.path.join(wd, "edges_bm"))
    assert len(v2) == len(blocks)
    assert sorted(v2.vid.tolist()) == list(range(len(v2)))
    assert e2.count() > 0
    assert out["offsets_bm"][-1] == len(v2)


def test_cli_partition_multilevel_and_hdrf(tmp_path, capsys,
                                           tiny_pages_dir):
    """`partition --multilevel N` runs the V-cycle; `hdrf` writes the
    vertex-cut edge assignment + replication report."""
    wd = str(tmp_path / "wd_mlh")
    assert main(["build", "--pages", tiny_pages_dir,
                 "--workdir", wd]) == 0
    capsys.readouterr()
    assert main(["partition", "--workdir", wd, "--k", "4",
                 "--chunk", "64", "--multilevel", "1"]) == 0
    out = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["partition"]
    assert out["k"] == 4
    assert len(out["levels"]) == 1
    assert 0.0 <= out["cut_fraction"] <= 1.0
    blocks = rd.read_parquet(os.path.join(wd, "blocks")).to_pandas()
    assert blocks.vid.nunique() == len(blocks)
    assert main(["hdrf", "--workdir", wd, "--k", "4",
                 "--chunk", "128"]) == 0
    h = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["hdrf"]
    assert h["replication_factor"] >= 1.0
    assert h["max_over_avg"] < 1.2
    eb = rd.read_parquet(os.path.join(wd, "edge_blocks")).to_pandas()
    assert len(eb) == h["n_edges"]
    assert set(eb.columns) == {"src", "dst", "block"}


def test_cli_wl_triads_cliques(tmp_path, capsys, tiny_pages_dir):
    """`wl` / `triads` / `cliques4`: structural-analysis family."""
    wd = str(tmp_path / "wd_struct")
    assert main(["build", "--pages", tiny_pages_dir,
                 "--workdir", wd]) == 0
    capsys.readouterr()
    assert main(["wl", "--workdir", wd]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["wl"]
    assert out["converged"] and out["n_classes"] > 1
    lab = rd.read_parquet(os.path.join(wd, "wl")).to_pandas()
    assert lab.wl_color.nunique() == out["n_classes"]
    assert main(["triads", "--workdir", wd]) == 0
    tc = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["triads"]
    assert len(tc) == 16 and sum(tc.values()) > 0
    assert main(["cliques4", "--workdir", wd]) == 0
    c4 = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["cliques4"]
    # tiny corpus plants 5-cliques: C(5,4)=5 four-cliques each
    assert c4["total"] >= 5
    per = rd.read_parquet(os.path.join(wd, "cliques4")).to_pandas()
    assert per.cliques4.sum() == 4 * c4["total"]


def test_cli_scan_redirects(tmp_path, capsys, tiny_pages_dir):
    """`scan` / `redirects`: structural-similarity clustering and
    functional-mapping resolution over a built workdir."""
    wd = str(tmp_path / "wd_scanred")
    assert main(["build", "--pages", tiny_pages_dir,
                 "--workdir", wd]) == 0
    capsys.readouterr()
    assert main(["scan", "--workdir", wd, "--eps", "0.5",
                 "--mu", "3"]) == 0
    sc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["scan"]
    assert sc["n_members"] >= sc["n_cores"] >= 0
    lab = rd.read_parquet(os.path.join(wd, "scan")).to_pandas()
    assert set(lab.columns) == {"vid", "label", "role"}
    assert set(lab.role.unique()) <= {"core", "border", "hub", "outlier"}
    assert lab.vid.is_unique

    assert main(["redirects", "--workdir", wd, "--rounds", "4"]) == 0
    rr = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["redirects"]
    assert rr["hop_bound"] == 16 and rr["n_resolved"] > 0
    res = rd.read_parquet(os.path.join(wd, "redirects")).to_pandas()
    assert (res.hops >= 1).all() and (res.hops <= 16).all()
    assert rr["n_resolved"] == len(res)


def test_cli_louvain_refine(tmp_path, capsys, tiny_pages_dir):
    wd = str(tmp_path / "wdlr")
    assert main(["build", "--pages", tiny_pages_dir, "--workdir", wd]) == 0
    capsys.readouterr()
    assert main(["louvain", "--workdir", wd, "--refine"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    ref = out["louvain"]["refine"]
    assert ref["n_after"] >= ref["n_before"] - ref["n_split"]
    assert ref["n_split"] >= 0
    labs = rd.read_parquet(os.path.join(wd, "louvain")).to_pandas()
    # min-vid canonical refined labels
    g = labs.groupby("community").vid.min()
    assert (g.index.values == g.values).all()


def test_cli_spectral_backbone_apx(tmp_path, capsys, tiny_pages_dir):
    wd = str(tmp_path / "wdsp")
    assert main(["build", "--pages", tiny_pages_dir, "--workdir", wd]) == 0
    capsys.readouterr()
    assert main(["spectral", "--workdir", wd, "--k", "4",
                 "--max-iters", "30"]) == 0
    sp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(sp["spectral"]["eigenvalues"]) == 4
    assert abs(sp["spectral"]["eigenvalues"][0] - 1.0) < 1e-6
    assert rd.read_parquet(
        os.path.join(wd, "spectral_embedding")).count() > 0
    assert main(["backbone", "--workdir", wd, "--alpha", "0.1"]) == 0
    bb = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert bb["backbone"]["n_edges"] > 0
    assert 0 <= bb["backbone"]["kept"] <= bb["backbone"]["n_edges"]
    assert main(["triangles-apx", "--workdir", wd,
                 "--k-samples", "2000"]) == 0
    ta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ta["triangles_apx"]["n_wedges"] > 0


def test_cli_bridges_summary(tmp_path, capsys, tiny_pages_dir):
    """`bridges` / `summary`: cut-edge census + one-shot profile."""
    wd = str(tmp_path / "wd_br")
    assert main(["build", "--pages", tiny_pages_dir,
                 "--workdir", wd]) == 0
    capsys.readouterr()
    assert main(["bridges", "--workdir", wd]) == 0
    br = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["bridges"]
    assert br["n_bridges"] >= 0 and br["n_roots"] >= 1
    if br["n_bridges"]:  # empty datasets write no parquet files
        b = rd.read_parquet(os.path.join(wd, "bridges")).to_pandas()
        assert len(b) == br["n_bridges"]
    assert main(["summary", "--workdir", wd]) == 0
    sm = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["summary"]
    assert sm["n_vertices"] > 0 and sm["n_edges"] > 0
    assert 0.0 <= sm["reciprocity"] <= 1.0


def test_cli_ann_build_search(tmp_path, capsys):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    centers = rng.normal(0, 1, (6, 12))
    mat = (np.repeat(centers, 50, axis=0)
           + rng.normal(0, 0.1, (300, 12))).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(300, dtype=np.int64)),
                  "embedding": pa.array(list(map(list, mat)),
                                        type=pa.list_(pa.float32()))})
    emb = str(tmp_path / "emb.parquet")
    pq.write_table(t, emb)
    idx = str(tmp_path / "idx")
    assert main(["ann-build", "--embeddings", emb, "--out", idx,
                 "--n-lists", "6"]) == 0
    meta = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["ann_index"]
    assert meta["n_vectors"] == 300
    qf = str(tmp_path / "q.parquet")
    pq.write_table(t.slice(0, 2), qf)
    assert main(["ann-search", "--index", idx, "--queries", qf,
                 "--k", "3", "--nprobe", "6"]) == 0
    res = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["ann_search"]
    assert len(res["hits"]) == 6  # 2 queries x k=3

"""PageRank parity vs NumPy oracle + checkpoint/resume semantics."""

import shutil

import numpy as np
import ray.data as rd

from halvesting_geometric_ray.graph.pagerank import pagerank

from .oracle import pagerank_oracle


def _edges_np(g):
    es = rd.read_parquet(g.edges).to_pandas()
    return es.src.to_numpy(), es.dst.to_numpy()


def _run(g, wd, **kw):
    edges = rd.read_parquet(g.edges)
    return pagerank(edges, g.offsets, wd, **kw)


def test_pagerank_matches_oracle_tiny(tiny_graph, tmp_path):
    src, dst = _edges_np(tiny_graph)
    n = tiny_graph.num_vertices
    exp, oracle_iters = pagerank_oracle(n, src, dst)
    ranks, info = _run(tiny_graph, str(tmp_path / "pr"))
    got = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert info["converged"]
    assert info["num_iters"] == oracle_iters
    assert np.allclose(got, exp, rtol=0, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9  # probability mass preserved


def test_pagerank_matches_oracle_small(small_graph, tmp_path):
    src, dst = _edges_np(small_graph)
    n = small_graph.num_vertices
    exp, _ = pagerank_oracle(n, src, dst)
    ranks, info = _run(small_graph, str(tmp_path / "pr"))
    got = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert info["converged"]
    assert np.allclose(got, exp, rtol=0, atol=1e-6)


def test_pagerank_sparse_checkpoint_interval(tiny_graph, tmp_path):
    """checkpoint_interval > 1 with convergence at a NON-interval
    iteration: the durable finalize must persist the converged state, not
    the pipelined overshoot round's (one iteration ahead)."""
    seq, info_seq = _run(tiny_graph, str(tmp_path / "seq"))
    exp = seq.to_pandas().sort_values("vid")["rank"].to_numpy()
    # pick an interval that does NOT divide the converged iteration count
    k = info_seq["num_iters"]
    interval = next(i for i in (7, 5, 3, 2) if k % i != 0)
    ranks, info = _run(tiny_graph, str(tmp_path / "sparse"),
                       checkpoint_interval=interval)
    assert info["converged"] and info["num_iters"] == k
    got = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(got, exp, rtol=0, atol=0)  # bitwise identical


def test_pagerank_resume_mid_run(tiny_graph, tmp_path):
    wd = str(tmp_path / "pr")
    # full run for the expected answer
    full, info_full = _run(tiny_graph, str(tmp_path / "pr_full"))
    exp = full.to_pandas().sort_values("vid")["rank"].to_numpy()

    # interrupted run: stop after 3 iterations
    _, info_a = _run(tiny_graph, wd, max_iters=3)
    assert info_a["num_iters"] == 3 and not info_a["converged"]

    # resume -> identical final ranks, fewer new iterations
    ranks_b, info_b = _run(tiny_graph, wd)
    assert info_b["resumed_from"] == 3
    got = ranks_b.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(got, exp, rtol=0, atol=0)  # bitwise same trajectory
    assert info_b["iters"][-1]["iter"] == info_full["iters"][-1]["iter"]


def test_pagerank_resume_mid_iteration(tiny_graph, tmp_path):
    """Partition files of an uncommitted iteration are reused, not
    recomputed — the per-partition lineage resume of the north rule."""
    import os

    wd = str(tmp_path / "pr")
    _, info_a = _run(tiny_graph, wd, max_iters=4)
    # fabricate a torn iteration 5: keep only SOME partition files
    ckpt_dir = os.path.join(wd, "pagerank", "iter_00005")
    # run one more iteration to produce files, then un-commit it
    _, _ = _run(tiny_graph, wd, max_iters=5)
    import json

    mpath = os.path.join(wd, "pagerank", "manifest.json")
    m = json.load(open(mpath))
    assert m["iters"].pop("5")["complete"]
    json.dump(m, open(mpath, "w"))
    files = sorted(os.listdir(ckpt_dir))
    for f in files[len(files) // 2:]:  # tear half the partitions
        os.remove(os.path.join(ckpt_dir, f))

    full, _ = _run(tiny_graph, str(tmp_path / "pr_full"))
    exp = full.to_pandas().sort_values("vid")["rank"].to_numpy()
    ranks, info = _run(tiny_graph, wd)
    assert info["resumed_from"] == 4
    got = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(got, exp, rtol=0, atol=0)


def ppr_oracle(n, src, dst, seeds, d=0.85, tol=1e-6, max_iters=200):
    """Personalized PageRank NumPy oracle (teleport + dangling to seeds)."""
    outdeg = np.bincount(src, minlength=n)
    r0 = np.zeros(n)
    r0[seeds] = 1.0 / len(seeds)
    r = r0.copy()
    iters = 0
    for _ in range(max_iters):
        iters += 1
        dm = r[outdeg == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / np.maximum(outdeg[src], 1))
        new = (1.0 - d) * r0 + d * (contrib + dm * r0)
        l1 = np.abs(new - r).sum()
        r = new
        if l1 < tol:
            break
    return r, iters


def test_personalized_pagerank_matches_oracle(tiny_graph, tmp_path):
    src, dst = _edges_np(tiny_graph)
    n = tiny_graph.num_vertices
    seeds = np.array([0, 3, 7], dtype=np.int64)
    exp, exp_iters = ppr_oracle(n, src, dst, seeds)
    ranks, info = _run(tiny_graph, str(tmp_path / "ppr"), seeds=seeds)
    got = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert info["converged"]
    assert info["num_iters"] == exp_iters
    assert np.allclose(got, exp, rtol=0, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9
    # mass concentrates near the seeds vs classic PageRank
    classic, _ = _run(tiny_graph, str(tmp_path / "pr_classic"))
    cg = classic.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert got[seeds].sum() > cg[seeds].sum()


def test_ppr_and_classic_checkpoints_do_not_mix(tiny_graph, tmp_path):
    wd = str(tmp_path / "shared")
    seeds = np.array([1, 2], dtype=np.int64)
    r1, _ = _run(tiny_graph, wd, seeds=seeds)
    a = r1.to_pandas().sort_values("vid")["rank"].to_numpy()
    # same workdir, classic run: lineage differs -> no stale adoption
    r2, info2 = _run(tiny_graph, wd)
    b = r2.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert info2["resumed_from"] is None
    assert not np.allclose(a, b)


def test_pagerank_manifest_never_ahead_of_parts(tiny_graph, tmp_path):
    """Every iteration the manifest marks complete must have ALL its
    part files on disk (r3 regression: convergence at a non-interval
    iteration used to commit the manifest before write_state ran,
    leaving a window where a crash broke resume)."""
    import json
    import os

    wd = str(tmp_path / "mna")
    _, info = _run(tiny_graph, wd, checkpoint_interval=5)
    assert info["converged"]
    mdir = os.path.join(wd, "pagerank")
    with open(os.path.join(mdir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["iters"], "no committed iterations"
    for k, entry in manifest["iters"].items():
        d = os.path.join(mdir, f"iter_{int(k):05d}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == len(tiny_graph.offsets) - 1, \
            f"iter {k} committed with {len(files)} part files"


def test_personalized_seeds_out_of_range_rejected(tiny_graph, tmp_path):
    import numpy as np
    import pytest
    import ray.data as rd

    from halvesting_geometric_ray.graph.pagerank import pagerank

    edges = rd.read_parquet(tiny_graph.edges)
    n = tiny_graph.num_vertices
    with pytest.raises(ValueError, match="seed vids"):
        pagerank(edges, tiny_graph.offsets, str(tmp_path / "ppr_bad"),
                 seeds=np.array([n], dtype=np.int64))
    with pytest.raises(ValueError, match="seed vids"):
        pagerank(edges, tiny_graph.offsets, str(tmp_path / "ppr_bad2"),
                 seeds=np.array([-1, 0], dtype=np.int64))


# ---------------- weighted PageRank ----------------

def _weighted_edges_ds(g, mult=False):
    """Deterministic synthetic weights over the fixture graph's edges.
    mult=True additionally DUPLICATES every third edge row (multigraph
    input) — the engine must fold multiplicity into the weight."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    src, dst = _edges_np(g)
    w = ((src * 31 + dst * 17) % 5 + 1).astype(np.float64)
    df = pd.DataFrame({"src": src, "dst": dst, "w": w})
    if mult:
        df = pd.concat([df, df.iloc[::3]], ignore_index=True)
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)), df


def test_pagerank_weighted_matches_oracle(tiny_graph, tmp_path):
    from .oracle import pagerank_weighted_oracle

    n = tiny_graph.num_vertices
    ds, df = _weighted_edges_ds(tiny_graph)
    exp, exp_iters = pagerank_weighted_oracle(
        n, df.src.to_numpy(), df.dst.to_numpy(), df.w.to_numpy())
    from halvesting_geometric_ray.graph.pagerank import pagerank

    ranks, info = pagerank(ds, tiny_graph.offsets, str(tmp_path / "wpr"),
                           job="wpr", weight_col="w")
    got = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert info["converged"]
    assert info["num_iters"] == exp_iters
    assert np.allclose(got, exp, rtol=0, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_weighted_multigraph_folds_multiplicity(tiny_graph, tmp_path):
    """Duplicate (src, dst) rows must SUM their weights — equivalent to
    feeding the pre-aggregated weighted table."""
    from halvesting_geometric_ray.graph.pagerank import pagerank

    ds_m, df_m = _weighted_edges_ds(tiny_graph, mult=True)
    agg = df_m.groupby(["src", "dst"], as_index=False)["w"].sum()
    import pyarrow as pa
    import ray.data as rd

    ds_a = rd.from_arrow(pa.Table.from_pandas(agg, preserve_index=False))
    r_m, _ = pagerank(ds_m, tiny_graph.offsets, str(tmp_path / "m"),
                      job="wpr", weight_col="w")
    r_a, _ = pagerank(ds_a, tiny_graph.offsets, str(tmp_path / "a"),
                      job="wpr", weight_col="w")
    a = r_m.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = r_a.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(a, b, rtol=0, atol=1e-12)


def test_pagerank_uniform_weights_equal_unweighted(tiny_graph, tmp_path):
    """Constant weights reduce to classic PageRank."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.graph.pagerank import pagerank

    src, dst = _edges_np(tiny_graph)
    df = pd.DataFrame({"src": src, "dst": dst,
                       "w": np.full(len(src), 3.0)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    r_w, _ = pagerank(ds, tiny_graph.offsets, str(tmp_path / "w"),
                      job="wpr", weight_col="w")
    r_u, _ = _run(tiny_graph, str(tmp_path / "u"))
    a = r_w.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = r_u.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(a, b, rtol=0, atol=1e-9)


def test_pagerank_weighted_rejects_nonpositive(tiny_graph, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from halvesting_geometric_ray.graph.pagerank import pagerank

    src, dst = _edges_np(tiny_graph)
    w = np.ones(len(src))
    w[0] = 0.0
    df = pd.DataFrame({"src": src, "dst": dst, "w": w})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    with pytest.raises(Exception, match="weights must be > 0"):
        pagerank(ds, tiny_graph.offsets, str(tmp_path / "bad"),
                 job="wpr", weight_col="w")

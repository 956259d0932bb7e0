"""Chaos resume: SIGKILL a real PageRank job process mid-run, then
resume in a fresh process — final ranks must be bitwise identical to an
uninterrupted run (the north rule's mid-iteration failure-resume, tested
with an actual kill rather than a simulated manifest tear)."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

_WORKER = r"""
import sys
import ray, ray.data as rd
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
rd.DataContext.get_current().enable_progress_bars = False
from halvesting_geometric_ray.fixtures import ensure_pages_parquet
from halvesting_geometric_ray.graph.build import build_graph, read_layer
from halvesting_geometric_ray.graph.pagerank import pagerank

wd = sys.argv[1]
g = build_graph(ensure_pages_parquet(2000, 7), wd)
ranks, info = pagerank(read_layer(g.edges), g.offsets, wd,
                       tol=1e-12, max_iters=60)
df = ranks.to_pandas().sort_values("vid")
df.to_parquet(f"{wd}/final_ranks.parquet", index=False)
print("DONE", info["num_iters"], flush=True)
ray.shutdown()
"""


@pytest.mark.slow
def test_pagerank_survives_sigkill(tmp_path):
    env = dict(os.environ)
    wd_ref = str(tmp_path / "ref")
    wd_kill = str(tmp_path / "kill")

    def run(wd, kill_after=None):
        p = subprocess.Popen([sys.executable, "-c", _WORKER, wd],
                             cwd="/root/repo", env=env,
                             stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                             text=True, start_new_session=True)
        if kill_after is None:
            out, _ = p.communicate(timeout=300)
            assert "DONE" in out, out
            return out
        # wait until some iteration checkpoints exist, then SIGKILL the
        # whole process tree mid-flight
        deadline = time.time() + 240
        it_dir = os.path.join(wd, "pagerank")
        while time.time() < deadline:
            if os.path.isdir(it_dir) and any(
                    f.startswith("iter_") for f in os.listdir(it_dir)):
                break
            if p.poll() is not None:
                break
            time.sleep(0.2)
        time.sleep(kill_after)
        if p.poll() is None:
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)  # driver + raylet
            p.wait(timeout=60)
            return None
        return p.communicate()[0]  # finished before we could kill it

    # uninterrupted reference
    run(wd_ref)
    import pandas as pd

    ref = pd.read_parquet(f"{wd_ref}/final_ranks.parquet")

    # killed run: let a few iterations land, then SIGKILL
    first = run(wd_kill, kill_after=0.5)
    if first is None:
        # fresh process resumes from whatever survived the kill
        out = run(wd_kill)
        assert "DONE" in out
    got = pd.read_parquet(f"{wd_kill}/final_ranks.parquet")
    assert np.array_equal(ref.vid.to_numpy(), got.vid.to_numpy())
    assert np.array_equal(ref["rank"].to_numpy(), got["rank"].to_numpy())


_LOUVAIN_WORKER = r"""
import sys
import ray, ray.data as rd
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
rd.DataContext.get_current().enable_progress_bars = False
import numpy as np
from halvesting_geometric_ray.fixtures import ensure_pages_parquet
from halvesting_geometric_ray.graph.build import build_graph, read_layer
from halvesting_geometric_ray.graph.louvain import louvain

wd = sys.argv[1]
g = build_graph(ensure_pages_parquet(2000, 7), wd)
labels, info = louvain(read_layer(g.edges), g.offsets, wd,
                       num_actors=3, checkpoint=True, ckpt_every=2)
df = labels.to_pandas().sort_values("vid")
df.to_parquet(f"{wd}/final_labels.parquet", index=False)
print("DONE", info["n_communities"], flush=True)
ray.shutdown()
"""


@pytest.mark.slow
def test_louvain_survives_sigkill(tmp_path):
    env = dict(os.environ)
    wd_ref = str(tmp_path / "ref")
    wd_kill = str(tmp_path / "kill")

    def run(wd, worker=_LOUVAIN_WORKER, kill_after=None):
        p = subprocess.Popen([sys.executable, "-c", worker, wd],
                             cwd="/root/repo", env=env,
                             stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL,
                             text=True, start_new_session=True)
        if kill_after is None:
            out, _ = p.communicate(timeout=300)
            assert "DONE" in out, out
            return out
        # wait for the first committed phase-1 checkpoint, then SIGKILL
        deadline = time.time() + 240
        ck_dir = os.path.join(wd, "louvain_ckpt", "l0")
        while time.time() < deadline:
            if os.path.isdir(ck_dir) and any(
                    f.startswith("iter_") for f in os.listdir(ck_dir)):
                break
            if p.poll() is not None:
                break
            time.sleep(0.2)
        time.sleep(kill_after)
        if p.poll() is None:
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            p.wait(timeout=60)
            return None
        return p.communicate()[0]

    run(wd_ref)
    import pandas as pd

    ref = pd.read_parquet(f"{wd_ref}/final_labels.parquet")

    first = run(wd_kill, kill_after=0.3)
    if first is None:
        out = run(wd_kill)
        assert "DONE" in out
    got = pd.read_parquet(f"{wd_kill}/final_labels.parquet")
    assert np.array_equal(ref.vid.to_numpy(), got.vid.to_numpy())
    assert np.array_equal(ref.community.to_numpy(),
                          got.community.to_numpy())

import os

# smaller shuffle fan-in for the 4-CPU test session (must be set before
# halvesting_geometric_ray.config is imported)
os.environ.setdefault("HGR_SHUFFLE_BLOCKS", "8")

import pytest
import ray
import ray.data as rd


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    from halvesting_geometric_ray.ops._util import tune_block_sizing
    tune_block_sizing()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    from halvesting_geometric_ray.fixtures import build_corpus

    return build_corpus(100, 42)


@pytest.fixture(scope="session")
def tiny_pages_dir():
    from halvesting_geometric_ray.fixtures import ensure_pages_parquet

    return ensure_pages_parquet(100, 42)


@pytest.fixture(scope="session")
def tiny_graph(tiny_pages_dir, tmp_path_factory):
    from halvesting_geometric_ray.graph.build import build_graph

    wd = str(tmp_path_factory.mktemp("graph_tiny"))
    return build_graph(tiny_pages_dir, wd)


@pytest.fixture(scope="session")
def small_corpus():
    from halvesting_geometric_ray.fixtures import build_corpus

    return build_corpus(2000, 7)


@pytest.fixture(scope="session")
def small_graph(tmp_path_factory):
    from halvesting_geometric_ray.fixtures import ensure_pages_parquet
    from halvesting_geometric_ray.graph.build import build_graph

    d = ensure_pages_parquet(2000, 7)
    wd = str(tmp_path_factory.mktemp("graph_small"))
    return build_graph(d, wd)

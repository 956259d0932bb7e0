"""halvesting_geometric_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch re-expression of the data-processing capabilities of
Madjakul/HALvesting-Geometric (citation-network construction + graph
analytics) over Common-Crawl-style web pages:

- per-document link extraction (html -> text + outlinks), the analogue of
  the reference's GROBID-XML citation extractor
  (reference: halvesting_geometric/utils/data/link_prediction_metadata.py:128-191);
- vertex/edge table construction with exact dedup and deterministic dense
  id assignment (reference: link_prediction_metadata.py:193-422);
- per-partition CSR shard build (reference coalesce:
  link_prediction_dataset.py:208-256);
- iterative gather-scatter analytics: PageRank, connected components
  (min-label propagation + pointer jumping), community label propagation,
  exact triangle counting (the deterministic special cases of the
  reference's GNN message passing, modules/sage.py:56-82);
- training-data operators: exact/near dedup (MinHash-LSH, SimHash, n-gram
  Jaccard, embedding cosine), similarity search, text analysis
  (language-id, quality scores, token counts, fingerprints).

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, ``groupby``/``map_groups``
shuffles keyed by explicit partition columns, stateful stages as actor
pools.  No module in this package calls ``ray.init``/``ray.shutdown`` —
sessions are owned by the caller (bench.py, CLI, test fixture).
"""

__version__ = "0.1.0"

import os as _os

# polars defaults to one thread pool per process sized to ALL cores; a
# 32-core box running 32 Ray workers would oversubscribe 1024 threads.
# Our per-batch/per-bucket frames are small — a few threads suffice.
_os.environ.setdefault("POLARS_MAX_THREADS", "4")

# Silence two known Ray 2.49 empty-block schema warnings (root cause is
# Ray's all-to-all operators, not this package — see _raylog docstring).
# Installed here so Ray worker processes pick the filter up too.
from . import _raylog as _raylog  # noqa: E402

_raylog.install()

"""Targeted silencing of two known Ray 2.49 log artifacts.

Ray's sort-based all-to-all operators emit EMPTY blocks with no schema
when a sort partition holds no rows (unavoidable whenever a groupby key
has fewer distinct values than shuffle partitions), and map operators
pass those blocks through without calling the UDF — the documented
workaround in ``ray/data/_internal/planner/plan_udf_map_op.py``
("TODO(hchen): ... some all-to-all operators output empty blocks with
no schema").  Every downstream schema check then logs, once per empty
partition:

- ``Operator produced a RefBundle with a different schema ...``
  (streaming_executor_state.py)
- ``Failed to hash the schemas (for deduplication): ...``
  (arrow_ops/transform_pyarrow.py)

Root cause verified externally to this package: a 2-key groupby over 32
blocks whose UDF always returns typed, non-empty Arrow tables still
logs both.  The filters below drop exactly those two messages and
nothing else; they are installed from the package ``__init__`` so they
take effect in Ray worker processes too (workers import the package
when deserializing its UDFs — the reduce-task copies of the noise are
worker-side).
"""

from __future__ import annotations

import logging

_SUBSTRINGS = (
    "Failed to hash the schemas (for deduplication)",
    "a RefBundle with a different schema",
)


class _DropEmptyBlockSchemaNoise(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        return not any(s in msg for s in _SUBSTRINGS)


_installed = False


def install() -> None:
    """Idempotently attach the two-message filter to the Ray loggers
    that emit the empty-block schema noise, and point
    ``RAY_DATA_LOGGING_CONFIG`` at the bundled config so processes that
    never import this package (Ray's own sort/reduce tasks) are quiet
    too.  The env var only reaches workers when set before ``ray.init``
    — true for bench.py / the CLI / the test fixture, which import this
    package first; the logger filters below cover the driver process in
    any import order."""
    global _installed
    if _installed:
        return
    import os

    cfg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ray_logging.yaml")
    os.environ.setdefault("RAY_DATA_LOGGING_CONFIG", cfg)
    for name in (
        "ray.data._internal.execution.streaming_executor_state",
        "ray.data._internal.arrow_ops.transform_pyarrow",
    ):
        logging.getLogger(name).addFilter(_DropEmptyBlockSchemaNoise())
    _installed = True

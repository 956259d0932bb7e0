"""Engine configuration defaults.

The reference hard-codes ``npartitions = physical cores``
(reference build_metadata.py:20,74); we key every wide operation on an
explicit partition count ``num_parts`` instead so the same pipeline runs
unchanged from 4 CPUs to a 256-node cluster (pick num_parts ~= 2-4x total
cores at real scale).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def default_num_parts() -> int:
    """Partition count for hash-keyed shuffles / CSR shards."""
    return int(os.environ.get("HGR_NUM_PARTS", "16"))


def default_shuffle_blocks() -> int:
    """Block count fed into sort-based shuffles.  Ray's sort emits one
    output partition per input block, so an M-block input costs an MxM
    object exchange — coalescing to ~2x cluster cores first cut a
    16-value groupby over 227 blocks from 46s to seconds (measured)."""
    return int(os.environ.get("HGR_SHUFFLE_BLOCKS", "32"))


@dataclass
class EngineConfig:
    # Wide-op partitioning (CSR shards, id assignment, bucketed joins).
    num_parts: int = field(default_factory=default_num_parts)
    shuffle_blocks: int = field(default_factory=default_shuffle_blocks)
    # Hash seed for stable url/content hashing (polars xxhash seed).
    hash_seed: int = 42
    # PageRank
    damping: float = 0.85
    pagerank_tol: float = 1e-6
    max_iters: int = 200
    # Hub-skew guidance (SURVEY.md section 7.4): when a join key's row
    # count exceeds roughly this many rows per bucket task, pass
    # ops.join.hash_join(salt=k) to split the hot key across k
    # sub-buckets.  Iterative analytics need no vertex-cut: scatter
    # pre-aggregates per shard AND per destination actor, so a hub's
    # work is one bincount wherever it lives.
    hub_degree_threshold: int = 8192
    # Checkpoint root (per-iteration per-partition lineage manifests).
    checkpoint_root: str = "/tmp/hgr_checkpoints"
    # Batch size for extraction-style stages (rows); html payloads are
    # small in fixtures; at 100 TB scale pages average ~100 KB so keep
    # batches modest to bound worker heap (batch x concurrency).
    extract_batch_size: int = 1024
    # LSH band-bucket size cap: a hot bucket (boilerplate duplicated
    # across millions of pages) must never become one O(n^2) pair task.
    # Buckets over the cap emit star edges to the bucket-min
    # representative instead — O(n) candidates, near-dups still connect
    # through the representative.
    lsh_bucket_cap: int = int(os.environ.get("HGR_LSH_BUCKET_CAP", "512"))


def load_config_file(path: str) -> dict:
    """S7 analogue of the reference's load_config_from_file
    (reference helpers.py:51-114): YAML or JSON by extension."""
    import json

    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext not in ("yaml", "yml", "json"):
        raise ValueError(f"unsupported config extension: {ext!r} (yaml/json)")
    with open(path) as f:
        if ext == "json":
            return json.load(f)
        import yaml

        return yaml.safe_load(f) or {}


def boolify(v) -> bool:
    """Tolerant bool coercion (reference helpers.py boolean_argument)."""
    if isinstance(v, bool):
        return v
    if isinstance(v, str):
        return v.lower() in ("yes", "true", "t", "y", "1")
    return v == 1


def config_from_file(path: str, **overrides) -> EngineConfig:
    """Build an EngineConfig from a YAML/JSON file; unknown keys are
    rejected loudly (a typo'd knob silently ignored is worse than an
    error), explicit kwargs win over file values."""
    from dataclasses import fields

    raw = load_config_file(path)
    raw.update(overrides)
    known = {f.name: f.type for f in fields(EngineConfig)}
    unknown = set(raw) - set(known)
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return EngineConfig(**raw)


DEFAULT = EngineConfig()
